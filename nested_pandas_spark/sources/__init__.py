from .bucketing import read_bucketed, write_bucketed
from .ivf_store import ivf_search, read_ivf_centroids, write_ivf_index
from .zorder import write_zordered, zorder_sql, zorder_value
