from .mesh import get_mesh, device_count
from .runner import BelugaRunner

__all__ = ["get_mesh", "device_count", "BelugaRunner"]
