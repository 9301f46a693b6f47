"""Batch preprocessing bridge: NDT downsampling for whole device batches."""
from ndtpu.preprocessing.batch import ndt_preprocessing, ndt_preprocessing_with_state  # noqa: F401
