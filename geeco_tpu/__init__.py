"""geeco_tpu: TPU-native GEECO — simulation, data, and visuomotor control."""

__version__ = '0.1.0'
