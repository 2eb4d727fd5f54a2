#!/usr/bin/env python3
"""CLI shim: same surface as the reference's test_model.py, backed by the
TPU-native engine (multimodal_segmentation_project_tpu.workloads.test_model)."""
from multimodal_segmentation_project_tpu.workloads import test_model as _driver

if __name__ == "__main__":
    _driver.main(_driver.build_parser().parse_args())
