"""Training: flow-matching objective, optimizer step, checkpointing.

The reference ships no training code at all (SURVEY §0: inference-only
package); this subpackage is the TPU-native addition that makes the framework
complete — conditional flow matching with span-masked infilling (the F5-TTS
recipe) as a single shardable ``train_step``.
"""

from .train import TrainConfig, flow_matching_loss, make_train_step, init_train_state

__all__ = ["TrainConfig", "flow_matching_loss", "make_train_step", "init_train_state"]
