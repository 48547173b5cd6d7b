"""dexbotic_tpu — a TPU-native Vision-Language-Action development framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of dexmal/dexbotic:
VLA pretraining, fine-tuning, serving and evaluation (CogACT, pi0/pi0.5, DM0,
OFT, MemVLA, NaVILA, discrete VLA, MUVLA) designed TPU-first: SPMD over device
meshes via GSPMD/pjit, functional transforms, lax control flow, and Pallas
kernels on the hot attention paths.
"""

__version__ = "0.1.0"

from dexbotic_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX  # noqa: F401
