"""EventAD-TPU: TPU-native multimodal driving anomaly detection.

A from-scratch JAX/XLA/Pallas framework with the capability surface of
PKU-XD/EventAD. See README.md for the architecture map."""

from .config import Config, parse_args  # noqa: F401

__version__ = "0.1.0"
