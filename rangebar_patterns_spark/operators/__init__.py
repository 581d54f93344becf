from .windows import bar_window, with_bar_features, with_forward_arrays

__all__ = ["bar_window", "with_bar_features", "with_forward_arrays"]
