"""MarkushGrapher-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for molecular
and Markush structure recognition from chemical document images.

Re-designed from scratch with the capabilities of DS4SD/MarkushGrapher
(reference layer map in SURVEY.md). Compute path is JAX on TPU; host-side
runtime (tokenization, chemistry, IO) is Python + optional C++ extensions.
"""

__version__ = "0.1.0"

from markushgrapher_tpu.config import (  # noqa: F401
    MarkushGrapherConfig,
    SwinConfig,
    VTLConfig,
)
