from multimodal_segmentation_project_tpu.utils.experiment import (
    ExperimentPaths,
    create_experiment_name,
    format_time,
    write_config,
    log_device_usage,
)
from multimodal_segmentation_project_tpu.utils.plotting import plot_training_metrics

__all__ = [
    "ExperimentPaths",
    "create_experiment_name",
    "format_time",
    "write_config",
    "log_device_usage",
    "plot_training_metrics",
]
