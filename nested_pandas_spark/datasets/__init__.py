from .generation import generate_data, generate_parquet_file
