from .tables import TABLE_NAMES, load_table, load_tables
from .text import read_text_lines, read_manifest

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "read_text_lines",
    "read_manifest",
]
