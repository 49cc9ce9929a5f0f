from address_parser_ray.state.checkpoint import Checkpointer
from address_parser_ray.state.compact import compact_parquet_dir

__all__ = ["Checkpointer", "compact_parquet_dir"]
