"""Descriptor inference: decode on host, preprocess + forward on device."""
