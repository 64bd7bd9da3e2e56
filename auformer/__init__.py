"""auformer — a TPU-native framework for multi-modal, multi-label facial
Action Unit detection with transformers (JAX / XLA / Pallas).

Re-implements the full capability surface of the ABAW3 reference
(ColinWine/Multi-modal-Multi-label-Facial-Action-Unit-Detection-with-
Transformer) as an idiomatic TPU framework:

- ``auformer.core``     config (opts-compatible CLI), PRNG, mesh runtime,
                        orbax checkpointing + .pth converter
- ``auformer.ops``      fused on-device preprocessing, mel-spectrogram audio
                        frontend, Pallas attention kernels
- ``auformer.nn``       the model zoo (avformer, vformer, sformer, tformer,
                        dual_sformer, van, i3d, mc3d, audio, resnet, emonet,
                        vggformer, tsav) built on flax.linen
- ``auformer.losses``   masked multi-task loss suite (AU BCE/dice/focal,
                        EX CE/focal, VA CCC) with fixed-shape sentinel masking
- ``auformer.metrics``  AccF1 / MultiLabelAccF1 / CCC accumulators
- ``auformer.data``     record-store data layer (LMDB-equivalent), split
                        builder, samplers, double-buffered device feed
- ``auformer.parallel`` mesh/pjit train-step builders (dp over ICI)

Output convention (matches reference train.py:135-138): every model maps a
batch dict to a ``(B, 21)`` array laid out ``[AU 0:12 | EX 12:19 | VA 19:21]``.
"""

__version__ = "0.1.0"

AU_NAMES = ("AU1", "AU2", "AU4", "AU6", "AU7", "AU10",
            "AU12", "AU15", "AU23", "AU24", "AU25", "AU26")
NUM_AU = 12
NUM_EX = 7
NUM_VA = 2
OUT_DIM = NUM_AU + NUM_EX + NUM_VA  # 21

# label sentinels (reference aff2compdataset.py:264-287)
AU_IGNORE = -1
EX_IGNORE = -1          # remapped to 7 at loss time (reference train.py:126,208)
EX_IGNORE_REMAPPED = 7
VA_IGNORE = -5.0


def __getattr__(name):
    # lazy convenience exports (keep bare `import auformer` lightweight)
    if name in ("build_model", "init_model", "loss_suite", "example_batch"):
        from . import nn
        return getattr(nn, name)
    if name == "Config":
        from .core.config import Config
        return Config
    if name == "parse_opt":
        from .core.config import parse_opt
        return parse_opt
    raise AttributeError(name)
