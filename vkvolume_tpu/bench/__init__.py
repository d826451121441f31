from .datasets import DATASETS, BenchDataset, synthesize, write_reference_format
from .harness import BenchResult, benchmark_camera, run_config, run_sweep

__all__ = [
    "DATASETS",
    "BenchDataset",
    "synthesize",
    "write_reference_format",
    "BenchResult",
    "benchmark_camera",
    "run_config",
    "run_sweep",
]
