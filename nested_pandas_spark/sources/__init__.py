from .bucketing import read_bucketed, write_bucketed
from .ivf_store import ivf_search, read_ivf_centroids, write_ivf_index
from .zorder import write_zordered, zorder_sql, zorder_value
from .ivf_store import ivfpq_search, write_ivfpq_index
from .lsh_store import lsh_search, read_lsh_params, write_lsh_index
from .warc import parse_warc_bytes, read_warc, read_wet
from .sizing import estimate_bytes_per_row, write_sized_parquet
from .tfrecord import read_tfrecord, write_tfrecord
