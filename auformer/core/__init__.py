from .config import Config, parse_opt, build_parser
from .prng import setup_seed, key_seq
from .mesh import make_mesh, data_sharding, replicated_sharding

__all__ = [
    "Config", "parse_opt", "build_parser",
    "setup_seed", "key_seq",
    "make_mesh", "data_sharding", "replicated_sharding",
]
