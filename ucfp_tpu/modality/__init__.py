"""Modality pipelines (layer 2): byte payloads -> Records via device kernels."""
