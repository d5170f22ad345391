from .native import (
    gather_rows,
    is_available,
    sliding_window_native,
    song_to_roll_native,
)

__all__ = ["gather_rows", "is_available", "sliding_window_native", "song_to_roll_native"]
