"""Data layer: dataset containers, transforms_exp_*.json loading, the
on-device stratified ray-budget sampler, and a synthetic procedural
dataset for hardware-free end-to-end testing."""

from idealnerf_tpu.data.dataset import FrameDataset, load_transforms_dataset
from idealnerf_tpu.data.sampler import RayBudget, sample_ray_coords, rays_at_coords
from idealnerf_tpu.data.synthetic import make_synthetic_dataset
