"""Audio DSP + fingerprint device kernels."""
