from . import boxes, geometry, transforms

__all__ = ['boxes', 'geometry', 'transforms']
