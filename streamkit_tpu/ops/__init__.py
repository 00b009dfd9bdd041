# SPDX-License-Identifier: Apache-2.0
"""Device compute kernels (JAX/XLA/Pallas): the hot DAG node implementations."""

from .dsp import apply_gain, convert_channels, f32_to_s16le, mix_frames, s16le_to_f32
from .mel import log_mel_spectrogram, mel_filterbank
from .resample import LinearResampler, max_output_frames, resample_chunk
from .vad import VAD_CONTEXT, VAD_FRAME, VadState, vad_frame_probs, vad_init_state
