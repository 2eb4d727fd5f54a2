#!/usr/bin/env python3
"""Orchestrator CLI shim (reference main.py surface, TPU-native backend)."""
from multimodal_segmentation_project_tpu.workloads.main import main

if __name__ == "__main__":
    main()
