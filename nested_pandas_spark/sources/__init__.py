from .bucketing import read_bucketed, write_bucketed
