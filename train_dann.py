#!/usr/bin/env python3
"""CLI shim: same surface as the reference's train_dann.py, backed by the
TPU-native engine (multimodal_segmentation_project_tpu.workloads.train_dann)."""
from multimodal_segmentation_project_tpu.workloads import train_dann as _driver

if __name__ == "__main__":
    _driver.main(_driver.build_parser().parse_args())
