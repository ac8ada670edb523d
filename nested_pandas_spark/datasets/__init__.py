from .generation import (
    generate_clustered_embeddings,
    generate_data,
    generate_parquet_file,
)
