from .header import Header, load_header, parse_header, write_header
from .loader import load_data, load_volume, normalise_to_u8, save_volume

__all__ = [
    "Header",
    "load_header",
    "parse_header",
    "write_header",
    "load_data",
    "load_volume",
    "normalise_to_u8",
    "save_volume",
]
