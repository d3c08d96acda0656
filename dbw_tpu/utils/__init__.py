"""Host-side utilities: config, paths, seeding, timing."""

from .config import load_yaml, dump_yaml, update_recursive
from .misc import path_exists, path_mkdir, get_files_from, timer, use_seed
