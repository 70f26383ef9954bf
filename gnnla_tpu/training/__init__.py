from gnnla_tpu.training import spectral_loss
from gnnla_tpu.training.datasets import (
    StackedGraphs, small_band_dataset, cosine_diffusion_dataset,
    constant_diffusion_dataset, frequency_study_dataset,
    diffusion_data_module)
from gnnla_tpu.training.train_jacobi import (
    TrainJacobiConfig, train as train_jacobi, evaluate_vs_baselines)
from gnnla_tpu.training.train_diffusion import (
    TrainDiffusionConfig, train as train_diffusion)

__all__ = ["spectral_loss", "StackedGraphs", "small_band_dataset",
           "cosine_diffusion_dataset", "constant_diffusion_dataset",
           "frequency_study_dataset", "diffusion_data_module",
           "TrainJacobiConfig", "train_jacobi", "evaluate_vs_baselines",
           "TrainDiffusionConfig", "train_diffusion"]
