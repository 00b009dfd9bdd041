# SPDX-License-Identifier: Apache-2.0
"""streamkit_tpu — TPU-native real-time media-pipeline framework.

A ground-up rebuild of the capabilities of streamer45/streamkit (Rust,
CPU-actor dataflow) designed for TPU hardware: node graphs compiled to XLA,
hot DSP/ML ops as JAX/Pallas kernels, continuous batching of live sessions,
and a host control plane (HTTP/WS/MoQ) in Python/C++.
"""

__version__ = "0.1.0"
