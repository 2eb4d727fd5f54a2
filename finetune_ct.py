#!/usr/bin/env python3
"""CLI shim: same surface as the reference's finetune_ct.py, backed by the
TPU-native engine (multimodal_segmentation_project_tpu.workloads.finetune_ct)."""
from multimodal_segmentation_project_tpu.workloads import finetune_ct as _driver

if __name__ == "__main__":
    _driver.main(_driver.build_parser().parse_args())
