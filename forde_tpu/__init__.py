"""forde-tpu: TPU-native FORDE framework (JAX / XLA / Pallas / pjit).

Public API re-exports for the most-used entry points; see subpackages for
the full surface (core, ops, nn, models, brain, parallel, data, train, obs).
"""

from forde_tpu.core.compile_cache import enable_persistent_cache

enable_persistent_cache()

from forde_tpu.core.config import (  # noqa: F401,E402
    BrainConfig,
    DTypePolicy,
    DualEncoderConfig,
    LLMConfig,
    TowerConfig,
    TrainConfig,
    create_default_config,
    vit_b16_config,
    vit_tiny_config,
    vit_tiny_hd128_config,
)
from forde_tpu.core.mesh import (  # noqa: F401,E402
    AXIS_CONTEXT,
    AXIS_DATA,
    AXIS_EXPERT,
    create_mesh,
    create_mesh_for_batch,
)

__version__ = "0.1.0"

__all__ = [
    "BrainConfig",
    "DTypePolicy",
    "DualEncoderConfig",
    "LLMConfig",
    "TowerConfig",
    "TrainConfig",
    "create_default_config",
    "vit_b16_config",
    "vit_tiny_config",
    "vit_tiny_hd128_config",
    "AXIS_CONTEXT",
    "AXIS_DATA",
    "AXIS_EXPERT",
    "create_mesh",
    "create_mesh_for_batch",
]
