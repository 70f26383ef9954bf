from gnnla_tpu.evaluation.eigen_analysis import (high_freq_modes,
                                                 eigen_analysis,
                                                 save_eigen_analysis,
                                                 load_eigen_analysis)
from gnnla_tpu.evaluation.freq_study import freq_study_errors
from gnnla_tpu.evaluation.ood import ood_extrapolation

__all__ = ["high_freq_modes", "eigen_analysis", "save_eigen_analysis",
           "load_eigen_analysis", "freq_study_errors", "ood_extrapolation"]
