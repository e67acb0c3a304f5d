"""Flax digit-classifier model family.

Capability parity with the reference model zoo: DigitCNN (reference
ml/model.py:19), DigitCNNv3 + Light + EmptyClassifier (reference
ml/model_v3.py:95/:232/:285) — residual blocks, squeeze-excitation,
spatial dropout, temperature scaling, MC-dropout uncertainty.
"""

from sudoku_vision_tpu.models.cnn import (
    DigitCNN,
    DigitCNNv3,
    DigitCNNv3Light,
    EmptyClassifier,
    count_parameters,
    forward_with_uncertainty,
)

__all__ = [
    "DigitCNN", "DigitCNNv3", "DigitCNNv3Light", "EmptyClassifier",
    "count_parameters", "forward_with_uncertainty",
]
