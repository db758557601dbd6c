from .ranges import Range, merge_ranges, subtract_ranges, parse_range
from .filenames import (
    DataKind,
    FileInfo,
    level1_dir,
    level2_dir,
    pad9,
    parse_filename,
    range_file_path,
    single_file_path,
)

__all__ = [
    "Range",
    "merge_ranges",
    "subtract_ranges",
    "parse_range",
    "DataKind",
    "FileInfo",
    "pad9",
    "level1_dir",
    "level2_dir",
    "parse_filename",
    "single_file_path",
    "range_file_path",
]
