from .bucketing import read_bucketed, write_bucketed
from .zorder import write_zordered, zorder_sql, zorder_value
