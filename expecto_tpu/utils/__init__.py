from .keep_mask import get_keep_mask
from .timing import Timer

__all__ = ["get_keep_mask", "Timer"]
