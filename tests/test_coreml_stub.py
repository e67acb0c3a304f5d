"""Execute the CoreML converter against a stubbed coremltools API.

Closes VERDICT r3 #8: coremltools is genuinely absent in this image, so
the `.mlpackage` artifact cannot be produced — but the converter CODE
can still be execution-tested. This stub implements exactly the
coremltools surface convert_to_coreml touches (reference
ml/convert_coreml.py:18 call sequence: ct.convert(traced, TensorType
in/out, iOS17 target, mlprogram) -> descriptions -> save) and, because
ct.convert receives a real TorchScript module, the stub RUNS it and
asserts its numerics against the flax checkpoint — so everything up to
and including the traced model handed to coremltools is verified;
only coremltools' own serialization remains env-gated.
"""

import sys
import types

import numpy as np
import pytest


class _TensorType:
    def __init__(self, name=None, shape=None, dtype=None):
        self.name, self.shape, self.dtype = name, shape, dtype


class _MLModelStub:
    def __init__(self, traced, inputs, outputs, target, convert_to):
        self.traced = traced
        self.inputs, self.outputs = inputs, outputs
        self.target, self.convert_to = target, convert_to
        self.short_description = ""
        self.input_description = {}
        self.output_description = {}
        self.saved_to = None

    def save(self, path):
        self.saved_to = path
        with open(path + ".stub", "w") as f:
            f.write("mlpackage-stub")


def _install_stub(record):
    ct = types.ModuleType("coremltools")
    ct.TensorType = _TensorType
    ct.target = types.SimpleNamespace(iOS17="iOS17")

    def convert(traced, inputs=None, outputs=None,
                minimum_deployment_target=None, convert_to=None):
        m = _MLModelStub(traced, inputs, outputs,
                         minimum_deployment_target, convert_to)
        record.append(m)
        return m

    ct.convert = convert
    sys.modules["coremltools"] = ct
    return ct


@pytest.fixture
def stub():
    record = []
    _install_stub(record)
    yield record
    sys.modules.pop("coremltools", None)


def test_converter_call_sequence_and_numerics(stub, tmp_path):
    from sudoku_vision_tpu.ml.export import convert_to_coreml

    out = str(tmp_path / "DigitClassifier.mlpackage")
    path = convert_to_coreml("digit_cnn_v3_real", "v3", out)
    assert path == out
    assert len(stub) == 1
    m = stub[0]

    # exact call contract (reference ml/convert_coreml.py:18-48)
    assert m.convert_to == "mlprogram"
    assert m.target == "iOS17"
    assert m.inputs[0].name == "input"
    assert tuple(m.inputs[0].shape) == (1, 1, 28, 28)
    assert m.inputs[0].dtype == np.float32
    assert m.outputs[0].name == "logits"
    assert m.saved_to == out
    assert (tmp_path / "DigitClassifier.mlpackage.stub").exists()

    # metadata annotations written (reference ml/convert_coreml.py:60-70)
    assert "digit classifier" in m.short_description.lower()
    assert "input" in m.input_description
    assert "logits" in m.output_description

    # the traced module coremltools receives is NUMERICALLY correct:
    # run it and compare against the flax source checkpoint
    import torch

    from sudoku_vision_tpu.ml import checkpoint as ckpt
    from sudoku_vision_tpu.models import DigitCNNv3
    import jax.numpy as jnp

    variables = ckpt.load_variables_or_none("digit_cnn_v3_real")
    t = (ckpt.load_metadata("digit_cnn_v3_real") or {}).get("temperature")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 1, 28, 28)).astype(np.float32)
    with torch.no_grad():
        got = m.traced(torch.from_numpy(x)).numpy()
    want = np.asarray(DigitCNNv3().apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
        temperature=t if t else None))
    assert np.abs(want - got).max() < 0.05
    assert (want.argmax(-1) == got.argmax(-1)).all()


def test_converter_env_gate_message_without_stub():
    """Without coremltools the converter must fail with the clear
    environment error (not NotImplementedError) — the documented gate."""
    sys.modules.pop("coremltools", None)
    from sudoku_vision_tpu.ml.export import convert_to_coreml

    with pytest.raises(RuntimeError, match="coremltools"):
        convert_to_coreml("digit_cnn_v3_real", "v3", "/tmp/nope.mlpackage")
