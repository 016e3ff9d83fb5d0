from .aimotive_dataset import AiMotiveDataset, augment_image_np, collate_aim
from .formats import Annotation, CameraParams, Sequence, object_to_array
from .frame_loader import FrameData, FrameLoader
from .native import native_available
from .nuscenes_dataset import NUSC_CLASSES, NuscMVDetDataset
from .synthetic import generate_synthetic_dataset

__all__ = [
    'AiMotiveDataset', 'Annotation', 'CameraParams', 'FrameData',
    'FrameLoader', 'NUSC_CLASSES', 'NuscMVDetDataset', 'Sequence',
    'augment_image_np', 'collate_aim', 'generate_synthetic_dataset',
    'native_available', 'object_to_array',
]
