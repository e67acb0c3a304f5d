"""CoreML mlprogram (.mlpackage) emission WITHOUT coremltools.

The reference produces its iOS model with coremltools
(reference ml/convert_coreml.py:18 -> ct.convert(traced, ..., mlprogram)
-> .save) and ships the result at
reference ios/SudokuVision/Resources/DigitClassifier.mlpackage.
coremltools is not installable in this image, so — following the repo's
ONNX precedent (ml/export.py::walk_onnx_minimal + ml/onnx_eval.py, which
emit and then execute the ONNX wire format dependency-free) — this
module serializes the MIL program protobuf DIRECTLY from the flax
checkpoint and verifies the produced package structurally, byte-for-byte
on the weights.

The wire schema (field numbers, MIL op/parameter vocabulary, the
weight-blob container) was extracted from the reference's SHIPPED
artifact, which is a verified instance of the format:

  Model.proto:   f1 specificationVersion (8 = iOS17), f2 description
                 {f1 input / f10 output FeatureDescription {f1 name,
                 f2 shortDescription, f3 type {f5 multiArrayType
                 {f1 packed shape, f2 dataType FLOAT32=65568}}},
                 f100 metadata {f1 short, f2 version, f3 author,
                 f4 license, f100 userDefined {f1 k, f2 v}}},
                 f502 mlProgram.
  MIL.proto:     Program {f1 version=1, f2 functions {f1 'main',
                 f2 Function}}; Function {f1 inputs NamedValueType,
                 f2 opset 'CoreML7', f3 block_specializations
                 {f1 'CoreML7', f2 Block}}; Block {f2 output names,
                 f3 Operation}; Operation {f1 type, f2 inputs
                 {f1 param, f2 {f1 {f1 bound name}}}, f3 outputs
                 NamedValueType {f1 name, f2 ValueType}, f5 attributes
                 {f1 name, f2 Value}}; ValueType {f1 TensorType
                 {f1 dataType, f2 rank, f3 Dimension {f1 {f1 size}}}};
                 Value {f2 type, f3 immediate {f1 TensorValue
                 {f1 floats/f2 ints/f3 bools/f4 strings, each {f1
                 packed}}}} or {f2 type, f5 blobFile {f1
                 '@model_path/weights/weight.bin', f2 offset}}.
  DataType enum: BOOL=1, STRING=2, FLOAT16=10, FLOAT32=11, INT32=23.
  weight.bin:    64-byte header {u32 blob count, u32 version=2}; per
                 blob a 64-byte-aligned metadata block {u32 sentinel
                 0xDEADBEEF, u32 dtype (1 = fp16), u64 sizeInBytes,
                 u64 data offset} followed by the 64-aligned payload;
                 blobFileValue.offset points at the METADATA block.

Like the reference's artifact, compute runs in fp16 (weights stored
fp16 in the blob; the graph casts the fp32 input in and the logits
back out), and the learned temperature is folded into the final
linear (ml/export.py::_copy_v3_weights precedent). What stays
env-gated is only Apple's runtime executing the ops — the package
structure, the op graph, and every weight byte are verified in-repo
(tests/test_coreml_emit.py).
"""

from __future__ import annotations

import json
import os
import struct
import uuid

import numpy as np

BLOB_PATH = "@model_path/weights/weight.bin"
DT_BOOL, DT_STR, DT_FP16, DT_FP32, DT_INT32 = 1, 2, 10, 11, 23
ARRAY_FLOAT32 = 65568
BLOB_SENTINEL = 0xDEADBEEF
BLOB_DT_FP16 = 1


# --------------------------------------------------------------------------
# protobuf wire-format writer primitives
# --------------------------------------------------------------------------

def _vi(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _vf(field: int, n: int) -> bytes:
    return _vi(field << 3) + _vi(n)


def _lf(field: int, payload: bytes) -> bytes:
    return _vi((field << 3) | 2) + _vi(len(payload)) + payload


def _sf(field: int, s: str) -> bytes:
    return _lf(field, s.encode())


# --------------------------------------------------------------------------
# MIL message builders
# --------------------------------------------------------------------------

def _tensor_type(dtype: int, shape=()) -> bytes:
    b = _vf(1, dtype)
    if shape:
        b += _vf(2, len(shape))
        for d in shape:
            b += _lf(3, _lf(1, _vf(1, int(d))))
    return b


def _vt(dtype: int, shape=()) -> bytes:
    return _lf(1, _tensor_type(dtype, shape))


def _nvt(name: str, dtype: int, shape=()) -> bytes:
    return _sf(1, name) + _lf(2, _vt(dtype, shape))


def _value_imm(dtype: int, shape, tensor_payload: bytes) -> bytes:
    return (_lf(2, _vt(dtype, shape))
            + _lf(3, _lf(1, tensor_payload)))


def _imm_ints(vals) -> bytes:
    vals = [int(v) for v in np.atleast_1d(np.asarray(vals))]
    packed = b"".join(_vi(v & 0xFFFFFFFF) for v in vals)
    return _value_imm(DT_INT32, (len(vals),), _lf(2, _lf(1, packed)))


def _imm_bool(v: bool) -> bytes:
    return _value_imm(DT_BOOL, (), _lf(3, _lf(1, _vi(1 if v else 0))))


def _imm_str(s: str) -> bytes:
    return _value_imm(DT_STR, (), _lf(4, _sf(1, s)))


def _blob_value(shape, offset: int) -> bytes:
    return (_lf(2, _vt(DT_FP16, shape))
            + _lf(5, _sf(1, BLOB_PATH) + _vf(2, offset)))


def _attr(name: str, value: bytes) -> bytes:
    return _lf(5, _sf(1, name) + _lf(2, value))


def _op_input(param: str, src: str) -> bytes:
    return _lf(2, _sf(1, param) + _lf(2, _lf(1, _sf(1, src))))


def _operation(op_type: str, inputs: dict, outputs, attrs=()) -> bytes:
    b = _sf(1, op_type)
    for param, src in inputs.items():
        b += _op_input(param, src)
    for name, dtype, shape in outputs:
        b += _lf(3, _nvt(name, dtype, shape))
    for a in attrs:
        b += a
    return _lf(3, b)


# --------------------------------------------------------------------------
# weight blob container
# --------------------------------------------------------------------------

class BlobWriter:
    """The coremltools blob container (format verified against the
    reference's shipped weight.bin — header/metadata layout above)."""

    def __init__(self):
        self.buf = bytearray(64)
        self.count = 0

    def add_fp16(self, arr: np.ndarray) -> int:
        data = np.ascontiguousarray(arr, dtype=np.float16).tobytes()
        while len(self.buf) % 64:
            self.buf.append(0)
        meta_off = len(self.buf)
        data_off = meta_off + 64
        meta = struct.pack("<IIQQ", BLOB_SENTINEL, BLOB_DT_FP16,
                           len(data), data_off)
        self.buf += meta + bytes(64 - len(meta)) + data
        self.count += 1
        return meta_off

    def tobytes(self) -> bytes:
        while len(self.buf) % 64:
            self.buf.append(0)
        struct.pack_into("<II", self.buf, 0, self.count, 2)
        return bytes(self.buf)


# --------------------------------------------------------------------------
# graph builder
# --------------------------------------------------------------------------

class _MILBuilder:
    def __init__(self):
        self.ops: list[bytes] = []
        self.blob = BlobWriter()
        self._n = 0

    def _uniq(self, stem: str) -> str:
        self._n += 1
        return f"{stem}_{self._n}"

    def const(self, name: str, value: bytes, dtype: int, shape=()) -> str:
        self.ops.append(_operation(
            "const", {}, [(name, dtype, shape)],
            [_attr("val", value), _attr("name", _imm_str(name))]))
        return name

    def const_ints(self, stem: str, vals) -> str:
        vals = list(np.atleast_1d(np.asarray(vals, np.int64)))
        return self.const(self._uniq(stem), _imm_ints(vals), DT_INT32,
                          (len(vals),))

    def const_str(self, stem: str, s: str) -> str:
        return self.const(self._uniq(stem), _imm_str(s), DT_STR)

    def const_bool(self, stem: str, v: bool) -> str:
        return self.const(self._uniq(stem), _imm_bool(v), DT_BOOL)

    def const_weight(self, stem: str, arr: np.ndarray) -> str:
        off = self.blob.add_fp16(arr)
        return self.const(self._uniq(stem), _blob_value(arr.shape, off),
                          DT_FP16, arr.shape)

    def op(self, op_type: str, inputs: dict, out_stem: str,
           out_shape, dtype: int = DT_FP16) -> str:
        name = self._uniq(out_stem)
        self.ops.append(_operation(op_type, inputs,
                                   [(name, dtype, out_shape)]))
        return name

    # --- composite layers (all fp16, NCHW) ---

    def cast(self, x: str, to: str, out_shape, dtype: int) -> str:
        d = self.const_str("cast_dtype", to)
        return self.op("cast", {"x": x, "dtype": d}, "cast", out_shape,
                       dtype)

    def conv(self, x: str, w: np.ndarray, b: np.ndarray, stride: int,
             in_shape) -> tuple[str, tuple]:
        """SAME-padded conv; w: OIHW, b: (O,). Returns (name, shape).

        Padding follows flax/TF SAME exactly: out = ceil(n/s), total
        pad = (out-1)*s + k - n, split BEFORE = total//2 (so stride 2
        on even inputs pads asymmetrically (0, 1) — a symmetric
        [1,1,1,1] shifts every stride-2 feature map by one pixel
        relative to the checkpoint; code-review finding, round 5,
        caught because the torch mirror inserts ZeroPad2d((0,1,0,1))
        for the same reason, ml/export.py). MIL custom pad layout is
        [top, bottom, left, right]."""
        o, _, kh, kw = w.shape
        n, _, h, wd = in_shape
        oh, ow = -(-h // stride), -(-wd // stride)
        pt = max((oh - 1) * stride + kh - h, 0)
        pl = max((ow - 1) * stride + kw - wd, 0)
        inputs = {
            "x": x,
            "weight": self.const_weight("w", w),
            "bias": self.const_weight("b", b),
            "strides": self.const_ints("strides", [stride, stride]),
            "pad_type": self.const_str("pad_type", "custom"),
            "pad": self.const_ints(
                "pad", [pt // 2, pt - pt // 2, pl // 2, pl - pl // 2]),
            "dilations": self.const_ints("dilations", [1, 1]),
            "groups": self.const_ints("groups", 1),
        }
        return (self.op("conv", inputs, "conv", (n, o, oh, ow)),
                (n, o, oh, ow))

    def relu(self, x: str, shape) -> str:
        return self.op("relu", {"x": x}, "relu", shape)

    def max_pool(self, x: str, k: int, in_shape) -> tuple[str, tuple]:
        """k x k max pool, stride k (param names verified against the
        reference artifact's max_pool ops)."""
        n, c, h, wd = in_shape
        out = (n, c, h // k, wd // k)
        inputs = {
            "x": x,
            "kernel_sizes": self.const_ints("kernel_sizes", [k, k]),
            "strides": self.const_ints("strides", [k, k]),
            "pad_type": self.const_str("pad_type", "valid"),
            "pad": self.const_ints("pad", [0, 0, 0, 0]),
            "ceil_mode": self.const_bool("ceil_mode", False),
        }
        return self.op("max_pool", inputs, "pool", out), out

    def linear(self, x: str, w: np.ndarray, b: np.ndarray, n: int) -> str:
        return self.op("linear", {
            "x": x,
            "weight": self.const_weight("w", w),
            "bias": self.const_weight("b", b),
        }, "linear", (n, w.shape[0]))

    def gap(self, x: str, shape) -> tuple[str, tuple]:
        """Global average pool NCHW -> (N, C)."""
        inputs = {
            "x": x,
            "axes": self.const_ints("axes", [2, 3]),
            "keep_dims": self.const_bool("keep_dims", False),
        }
        out = (shape[0], shape[1])
        return self.op("reduce_mean", inputs, "gap", out), out


def _fold_bn(w_oihw: np.ndarray, p: dict, s: dict,
             eps: float = 1e-5) -> tuple[np.ndarray, np.ndarray]:
    """Fold a flax BatchNorm (params scale/bias, stats mean/var) into
    the preceding bias-free conv: W' = W*g, b' = beta - mean*g where
    g = scale/sqrt(var+eps)."""
    g = np.asarray(p["scale"]) / np.sqrt(np.asarray(s["var"]) + eps)
    w = w_oihw * g[:, None, None, None]
    b = np.asarray(p["bias"]) - np.asarray(s["mean"]) * g
    return w.astype(np.float32), b.astype(np.float32)


def _oihw(kernel) -> np.ndarray:
    """flax HWIO conv kernel -> MIL OIHW."""
    return np.transpose(np.asarray(kernel), (3, 2, 0, 1))


def build_v3_program(variables, temperature=None) -> tuple[bytes, bytes]:
    """flax DigitCNNv3 checkpoint -> (mil Program bytes, weight.bin
    bytes). Mirrors models/cnn.py:117 exactly: stem conv-BN-relu, 5
    residual+SE blocks, GAP, Dense 128 + relu, Dense 10 (temperature
    folded), dropout layers elided (inference graph)."""
    from sudoku_vision_tpu.models.cnn import DigitCNNv3

    params, stats = variables["params"], variables["batch_stats"]
    blocks = DigitCNNv3.blocks
    mb = _MILBuilder()

    x = mb.cast("input", "fp16", (1, 1, 28, 28), DT_FP16)
    shape = (1, 1, 28, 28)
    w, b = _fold_bn(_oihw(params["Conv_0"]["kernel"]),
                    params["BatchNorm_0"], stats["BatchNorm_0"])
    x, shape = mb.conv(x, w, b, 1, shape)
    x = mb.relu(x, shape)

    for i, (ch, st) in enumerate(blocks):
        bp, bs = params[f"ResidualBlock_{i}"], stats[f"ResidualBlock_{i}"]
        w, b = _fold_bn(_oihw(bp["Conv_0"]["kernel"]),
                        bp["BatchNorm_0"], bs["BatchNorm_0"])
        y, yshape = mb.conv(x, w, b, st, shape)
        y = mb.relu(y, yshape)
        w, b = _fold_bn(_oihw(bp["Conv_1"]["kernel"]),
                        bp["BatchNorm_1"], bs["BatchNorm_1"])
        y, yshape = mb.conv(y, w, b, 1, yshape)
        # SE: GAP -> fc -> relu -> fc -> sigmoid -> scale
        sp = bp["SEBlock_0"]
        s, _ = mb.gap(y, yshape)
        s = mb.linear(s, np.asarray(sp["Dense_0"]["kernel"]).T,
                      np.asarray(sp["Dense_0"]["bias"]), 1)
        s = mb.relu(s, (1, np.asarray(sp["Dense_0"]["bias"]).shape[0]))
        s = mb.linear(s, np.asarray(sp["Dense_1"]["kernel"]).T,
                      np.asarray(sp["Dense_1"]["bias"]), 1)
        s = mb.op("sigmoid", {"x": s}, "sigmoid", (1, ch))
        sr = mb.op("reshape", {
            "x": s, "shape": mb.const_ints("shape", [1, ch, 1, 1]),
        }, "reshape", (1, ch, 1, 1))
        y = mb.op("mul", {"x": y, "y": sr}, "se_scale", yshape)
        # projected / identity skip
        if shape[1] != ch or st != 1:
            w, b = _fold_bn(_oihw(bp["Conv_2"]["kernel"]),
                            bp["BatchNorm_2"], bs["BatchNorm_2"])
            skip, _ = mb.conv(x, w, b, st, shape)
        else:
            skip = x
        x = mb.op("add", {"x": y, "y": skip}, "block_add", yshape)
        x = mb.relu(x, yshape)
        shape = yshape

    x, gshape = mb.gap(x, shape)
    x = mb.linear(x, np.asarray(params["Dense_0"]["kernel"]).T,
                  np.asarray(params["Dense_0"]["bias"]), 1)
    x = mb.relu(x, (1, 128))
    t = float(temperature) if temperature else 1.0
    x = mb.linear(x, np.asarray(params["Dense_1"]["kernel"]).T / t,
                  np.asarray(params["Dense_1"]["bias"]) / t, 1)
    out = mb.cast(x, "fp32", (1, 10), DT_FP32)
    # The block's (sole) output must be the declared model output name.
    final = _operation("identity", {"x": out},
                       [("logits", DT_FP32, (1, 10))])
    mb.ops.append(final)

    return _wrap_program(mb), mb.blob.tobytes()


def build_empty_program(variables) -> tuple[bytes, bytes]:
    """flax EmptyClassifier checkpoint -> (mil Program, weight.bin).

    Mirrors models/cnn.py:182 (reference ml/model_v3.py:285): two
    conv-relu-maxpool blocks (convs carry their own bias — no BN to
    fold), GAP, Dense 2. Output 'logits' is [is_empty, is_digit]."""
    params = variables["params"]
    mb = _MILBuilder()
    x = mb.cast("input", "fp16", (1, 1, 28, 28), DT_FP16)
    shape = (1, 1, 28, 28)
    for i in (0, 1):
        p = params[f"Conv_{i}"]
        x, shape = mb.conv(x, _oihw(p["kernel"]),
                           np.asarray(p["bias"], np.float32), 1, shape)
        x = mb.relu(x, shape)
        x, shape = mb.max_pool(x, 2, shape)
    x, _ = mb.gap(x, shape)
    x = mb.linear(x, np.asarray(params["Dense_0"]["kernel"]).T,
                  np.asarray(params["Dense_0"]["bias"]), 1)
    out = mb.cast(x, "fp32", (1, 2), DT_FP32)
    mb.ops.append(_operation("identity", {"x": out},
                             [("logits", DT_FP32, (1, 2))]))
    return _wrap_program(mb), mb.blob.tobytes()


def _wrap_program(mb: _MILBuilder) -> bytes:
    block = _sf(2, "logits") + b"".join(mb.ops)
    function = (_lf(1, _nvt("input", DT_FP32, (1, 1, 28, 28)))
                + _sf(2, "CoreML7")
                + _lf(3, _sf(1, "CoreML7") + _lf(2, block)))
    return _vf(1, 1) + _lf(2, _sf(1, "main") + _lf(2, function))


# --------------------------------------------------------------------------
# model + package assembly
# --------------------------------------------------------------------------

def _feature(field: int, name: str, desc: str, shape) -> bytes:
    ftype = _lf(3, _lf(5, _lf(1, b"".join(_vi(d) for d in shape))
                       + _vf(2, ARRAY_FLOAT32)))
    return _lf(field, _sf(1, name) + _sf(2, desc) + ftype)


def _description(short: str, in_desc: str, out_desc: str,
                 out_shape) -> bytes:
    meta = (_sf(1, short)
            + _sf(2, "1.0.0")
            + _sf(3, "sudoku-vision-tpu")
            + _sf(4, "MIT")
            + _lf(100, _sf(1, "source")
                  + _sf(2, "sudoku_vision_tpu.ml.coreml_emit "
                           "(direct MIL emission, no coremltools)"))
            + _lf(100, _sf(1, "source_dialect") + _sf(2, "flax")))
    return (_feature(1, "input", in_desc, (1, 1, 28, 28))
            + _feature(10, "logits", out_desc, out_shape)
            + _lf(100, meta))


_MODELS = {
    "v3": {
        "build": lambda v, t: build_v3_program(v, t),
        "short": "Sudoku digit classifier (28x28 grayscale -> 10 logits)",
        "in": ("28x28 preprocessed cell as [1, 1, 28, 28] float32, "
               "the pipeline's canonical normalization (see "
               "cv/extract.py preprocess_cells_for_model)"),
        "out": ("10 class logits (0 = empty, 1-9 = digits); "
                "temperature already folded"),
        "out_shape": (1, 10),
    },
    "empty_gate": {
        "build": lambda v, t: build_empty_program(v),
        "short": ("Sudoku empty-cell gate (28x28 raw grayscale -> "
                  "[is_empty, is_digit] logits)"),
        "in": ("RAW 28x28 cell as [1, 1, 28, 28] float32, normalized "
               "(x/255 - 0.5)/0.5 — NOT the thresholded input (see "
               "ml/empty_gate.py)"),
        "out": ("binary logits [is_empty, is_digit]; apply the "
                "calibrated threshold from models_ckpt/empty_gate.json"),
        "out_shape": (1, 2),
    },
}


def emit_mlpackage(ckpt_name: str, out_dir: str,
                   fold_temperature: bool = True,
                   model_kind: str = "v3") -> str:
    """flax checkpoint -> .mlpackage directory. Returns out_dir."""
    from sudoku_vision_tpu.ml import checkpoint as ckpt

    variables = ckpt.load_variables_or_none(ckpt_name)
    if variables is None:
        raise FileNotFoundError(ckpt_name)
    temperature = None
    if fold_temperature:
        temperature = (ckpt.load_metadata(ckpt_name) or {}).get(
            "temperature")
    spec = _MODELS[model_kind]
    program, blob = spec["build"](variables, temperature)

    model = (_vf(1, 8)                      # specificationVersion iOS17
             + _lf(2, _description(spec["short"], spec["in"],
                                   spec["out"], spec["out_shape"]))
             + _lf(502, program))

    data_dir = os.path.join(out_dir, "Data", "com.apple.CoreML")
    os.makedirs(os.path.join(data_dir, "weights"), exist_ok=True)
    with open(os.path.join(data_dir, "model.mlmodel"), "wb") as f:
        f.write(model)
    with open(os.path.join(data_dir, "weights", "weight.bin"), "wb") as f:
        f.write(blob)
    # Deterministic ids (uuid5 over the payloads) keep rebuilds stable.
    mid = str(uuid.uuid5(uuid.NAMESPACE_URL, "model:" + ckpt_name)).upper()
    wid = str(uuid.uuid5(uuid.NAMESPACE_URL, "weights:" + ckpt_name)).upper()
    manifest = {
        "fileFormatVersion": "1.0.0",
        "itemInfoEntries": {
            mid: {"author": "com.apple.CoreML",
                  "description": "CoreML Model Specification",
                  "name": "model.mlmodel",
                  "path": "com.apple.CoreML/model.mlmodel"},
            wid: {"author": "com.apple.CoreML",
                  "description": "CoreML Model Weights",
                  "name": "weights",
                  "path": "com.apple.CoreML/weights"},
        },
        "rootModelIdentifier": mid,
    }
    with open(os.path.join(out_dir, "Manifest.json"), "w") as f:
        json.dump(manifest, f, indent=4)
    return out_dir


# --------------------------------------------------------------------------
# structural walker / verifier
# --------------------------------------------------------------------------

def _read_vi(buf: bytes, i: int) -> tuple[int, int]:
    v = s = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << s
        if not b & 0x80:
            return v, i
        s += 7


def _fields(buf: bytes):
    i = 0
    while i < len(buf):
        key, i = _read_vi(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_vi(buf, i)
            yield fn, v
        elif wt == 2:
            ln, i = _read_vi(buf, i)
            yield fn, buf[i:i + ln]
            i += ln
        elif wt == 5:
            yield fn, buf[i:i + 4]
            i += 4
        elif wt == 1:
            yield fn, buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _one(buf: bytes, field: int):
    for fn, v in _fields(buf):
        if fn == field:
            return v
    return None


def _many(buf: bytes, field: int) -> list:
    return [v for fn, v in _fields(buf) if fn == field]


def _shape_of(vt: bytes) -> tuple:
    tt = _one(vt, 1)
    return tuple(int(_one(_one(d, 1), 1)) for d in _many(tt, 3))


def walk_mlpackage(path: str) -> dict:
    """Structural + dataflow + weight-content verification of an
    emitted .mlpackage. Raises ValueError on any inconsistency; returns
    a summary dict (the walk_onnx_minimal pattern, ml/export.py:271)."""
    with open(os.path.join(path, "Manifest.json")) as f:
        manifest = json.load(f)
    root = manifest["rootModelIdentifier"]
    if root not in manifest["itemInfoEntries"]:
        raise ValueError("rootModelIdentifier not in itemInfoEntries")
    for entry in manifest["itemInfoEntries"].values():
        p = os.path.join(path, "Data", entry["path"])
        if not os.path.exists(p):
            raise ValueError(f"manifest path missing: {entry['path']}")

    with open(os.path.join(path, "Data", "com.apple.CoreML",
                           "model.mlmodel"), "rb") as f:
        model = f.read()
    with open(os.path.join(path, "Data", "com.apple.CoreML", "weights",
                           "weight.bin"), "rb") as f:
        blob = f.read()

    spec = _one(model, 1)
    if spec != 8:
        raise ValueError(f"specificationVersion {spec} != 8 (iOS17)")
    desc = _one(model, 2)
    in_name = _one(_one(desc, 1), 1).decode()
    out_name = _one(_one(desc, 10), 1).decode()

    program = _one(model, 502)
    if _one(program, 1) != 1:
        raise ValueError("MIL program version != 1")
    fentry = _one(program, 2)
    if _one(fentry, 1).decode() != "main":
        raise ValueError("missing 'main' function")
    function = _one(fentry, 2)
    if _one(function, 2).decode() != "CoreML7":
        raise ValueError("function opset != CoreML7")
    spec_entry = _one(function, 3)
    if _one(spec_entry, 1).decode() != "CoreML7":
        raise ValueError("block specialization key != CoreML7")
    block = _one(spec_entry, 2)

    defined = {_one(_one(function, 1), 1).decode()}
    if in_name not in defined:
        raise ValueError("model input not a function input")

    blob_count, blob_version = struct.unpack_from("<II", blob, 0)
    if blob_version != 2:
        raise ValueError(f"blob container version {blob_version} != 2")

    op_counts: dict[str, int] = {}
    n_blobs = 0
    weight_bytes = 0
    blob_meta: list[tuple[int, int, tuple]] = []
    for opbuf in _many(block, 3):
        op_type = _one(opbuf, 1).decode()
        op_counts[op_type] = op_counts.get(op_type, 0) + 1
        # dataflow: every input binding must already be defined
        for inp in _many(opbuf, 2):
            bound = _one(_one(_one(inp, 2), 1), 1).decode()
            if bound not in defined:
                raise ValueError(
                    f"op '{op_type}' input '{bound}' used before "
                    "definition (SSA violation)")
        for out in _many(opbuf, 3):
            defined.add(_one(out, 1).decode())
        # blob references: resolve + sentinel-check every one
        for att in _many(opbuf, 5):
            value = _one(att, 2)
            bf = _one(value, 5)
            if bf is None:
                continue
            fname = _one(bf, 1).decode()
            if fname != BLOB_PATH:
                raise ValueError(f"unexpected blob path {fname}")
            off = _one(bf, 2) or 0
            if off % 64 or off + 64 > len(blob):
                raise ValueError(f"blob metadata offset {off} invalid")
            sent, dt, size, doff = struct.unpack_from("<IIQQ", blob, off)
            if sent != BLOB_SENTINEL:
                raise ValueError(f"blob sentinel missing at {off}")
            if dt != BLOB_DT_FP16:
                raise ValueError(f"blob dtype {dt} != fp16")
            if doff + size > len(blob):
                raise ValueError("blob payload out of range")
            shape = _shape_of(_one(value, 2))
            want = 2 * int(np.prod(shape)) if shape else 2
            if size != want:
                raise ValueError(
                    f"blob size {size} != shape {shape} bytes {want}")
            n_blobs += 1
            weight_bytes += size
            blob_meta.append((doff, size, shape))

    outputs = [v.decode() for fn, v in _fields(block) if fn == 2]
    if out_name not in outputs:
        raise ValueError("model output not among block outputs")
    if out_name not in defined:
        raise ValueError("block output never produced by an op")
    if n_blobs != blob_count:
        raise ValueError(
            f"blob header count {blob_count} != referenced {n_blobs}")
    return {
        "spec_version": spec,
        "input": in_name,
        "output": out_name,
        "n_ops": sum(op_counts.values()),
        "op_counts": dict(sorted(op_counts.items())),
        "n_blobs": n_blobs,
        "weight_bytes": weight_bytes,
        "blob_meta": blob_meta,
    }


def verify_weights(path: str, ckpt_name: str,
                   fold_temperature: bool = True,
                   model_kind: str = "v3") -> int:
    """Byte-compare every stored blob against the fp16 fold of the
    checkpoint, in emission order. Returns the number of verified
    blobs; raises on any mismatch."""
    from sudoku_vision_tpu.ml import checkpoint as ckpt

    variables = ckpt.load_variables_or_none(ckpt_name)
    temperature = None
    if fold_temperature:
        temperature = (ckpt.load_metadata(ckpt_name) or {}).get(
            "temperature")
    if model_kind == "empty_gate":
        p = variables["params"]
        expect = []
        for i in (0, 1):
            expect.append(_oihw(p[f"Conv_{i}"]["kernel"]))
            expect.append(np.asarray(p[f"Conv_{i}"]["bias"], np.float32))
        expect.append(np.asarray(p["Dense_0"]["kernel"]).T)
        expect.append(np.asarray(p["Dense_0"]["bias"]))
        return _compare_blobs(path, expect)
    params, stats = variables["params"], variables["batch_stats"]
    from sudoku_vision_tpu.models.cnn import DigitCNNv3

    expect: list[np.ndarray] = []

    def conv_wb(kernel, bn_p, bn_s):
        w, b = _fold_bn(_oihw(kernel), bn_p, bn_s)
        expect.append(w)
        expect.append(b)

    def dense_wb(p, scale=1.0):
        expect.append(np.asarray(p["kernel"]).T / scale)
        expect.append(np.asarray(p["bias"]) / scale)

    conv_wb(params["Conv_0"]["kernel"], params["BatchNorm_0"],
            stats["BatchNorm_0"])
    in_ch = DigitCNNv3.stem
    for i, (ch, st) in enumerate(DigitCNNv3.blocks):
        bp, bs = params[f"ResidualBlock_{i}"], stats[f"ResidualBlock_{i}"]
        conv_wb(bp["Conv_0"]["kernel"], bp["BatchNorm_0"],
                bs["BatchNorm_0"])
        conv_wb(bp["Conv_1"]["kernel"], bp["BatchNorm_1"],
                bs["BatchNorm_1"])
        dense_wb(bp["SEBlock_0"]["Dense_0"])
        dense_wb(bp["SEBlock_0"]["Dense_1"])
        if in_ch != ch or st != 1:
            conv_wb(bp["Conv_2"]["kernel"], bp["BatchNorm_2"],
                    bs["BatchNorm_2"])
        in_ch = ch
    dense_wb(params["Dense_0"])
    t = float(temperature) if temperature else 1.0
    dense_wb(params["Dense_1"], t)
    return _compare_blobs(path, expect)


def _compare_blobs(path: str, expect: list) -> int:
    info = walk_mlpackage(path)
    if len(info["blob_meta"]) != len(expect):
        raise ValueError(f"blob count {len(info['blob_meta'])} != "
                         f"expected {len(expect)}")
    with open(os.path.join(path, "Data", "com.apple.CoreML", "weights",
                           "weight.bin"), "rb") as f:
        blob = f.read()
    for k, ((doff, size, shape), want) in enumerate(
            zip(info["blob_meta"], expect)):
        got = np.frombuffer(blob[doff:doff + size], np.float16)
        ref = np.ascontiguousarray(want, np.float16).reshape(-1)
        if got.shape != ref.shape or not np.array_equal(
                got, ref, equal_nan=True):
            raise ValueError(f"blob {k} (shape {shape}) differs from "
                             "checkpoint fold")
    return len(expect)


# --------------------------------------------------------------------------
# numeric execution (the walk_onnx_minimal -> onnx_eval progression:
# structure/bytes alone missed a stride-2 SAME-padding asymmetry —
# code-review finding, round 5 — so the emitted program is now RUN)
# --------------------------------------------------------------------------

def _decode_value(value: bytes, blob: bytes):
    """MIL Value -> np array / str / bool (immediate or blob)."""
    shape = _shape_of(_one(value, 2))
    bf = _one(value, 5)
    if bf is not None:
        off = _one(bf, 2) or 0
        _, _, size, doff = struct.unpack_from("<IIQQ", blob, off)
        arr = np.frombuffer(blob[doff:doff + size],
                            np.float16).astype(np.float32)
        return arr.reshape(shape) if shape else arr[0]
    tv = _one(_one(value, 3), 1)
    ints = _one(tv, 2)
    if ints is not None:
        packed = _one(ints, 1)
        vals, i = [], 0
        while i < len(packed):
            v, i = _read_vi(packed, i)
            vals.append(v - (1 << 32) if v & 0x80000000 else v)
        return np.asarray(vals, np.int64)
    bools = _one(tv, 3)
    if bools is not None:
        v, _ = _read_vi(_one(bools, 1), 0)
        return bool(v)
    strs = _one(tv, 4)
    if strs is not None:
        return _one(strs, 1).decode()
    raise ValueError("unsupported immediate value")


def execute_mlpackage(path: str, x: np.ndarray) -> np.ndarray:
    """Run the emitted MIL program on (N, 1, 28, 28) float32 input.

    Weights are read back from the blob (so fp16 storage rounding is
    included); arithmetic runs in float32 — the comparison tolerance
    vs the flax checkpoint absorbs Apple's fp16-accumulate delta."""
    import jax
    import jax.numpy as jnp

    with open(os.path.join(path, "Data", "com.apple.CoreML",
                           "model.mlmodel"), "rb") as f:
        model = f.read()
    with open(os.path.join(path, "Data", "com.apple.CoreML", "weights",
                           "weight.bin"), "rb") as f:
        blob = f.read()
    desc = _one(model, 2)
    in_name = _one(_one(desc, 1), 1).decode()
    out_name = _one(_one(desc, 10), 1).decode()
    function = _one(_one(_one(model, 502), 2), 2)
    block = _one(_one(function, 3), 2)

    n = x.shape[0]
    env: dict = {in_name: np.asarray(x, np.float32)}

    def conv(xa, w, b, strides, pads):
        out = jax.lax.conv_general_dilated(
            jnp.asarray(xa), jnp.asarray(w),
            window_strides=[int(s) for s in strides],
            padding=((int(pads[0]), int(pads[1])),
                     (int(pads[2]), int(pads[3]))),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return np.asarray(out) + np.asarray(b).reshape(1, -1, 1, 1)

    def max_pool(xa, ks, strides):
        out = jax.lax.reduce_window(
            jnp.asarray(xa), -jnp.inf, jax.lax.max,
            (1, 1, int(ks[0]), int(ks[1])),
            (1, 1, int(strides[0]), int(strides[1])), "VALID")
        return np.asarray(out)

    for opbuf in _many(block, 3):
        t = _one(opbuf, 1).decode()
        ins = {}
        for inp in _many(opbuf, 2):
            ins[_one(inp, 1).decode()] = \
                _one(_one(_one(inp, 2), 1), 1).decode()
        outs = [_one(o, 1).decode() for o in _many(opbuf, 3)]
        if t == "const":
            for att in _many(opbuf, 5):
                if _one(att, 1).decode() == "val":
                    env[outs[0]] = _decode_value(_one(att, 2), blob)
            continue
        a = {k: env[v] for k, v in ins.items()}
        if t == "cast":
            r = (a["x"].astype(np.float16).astype(np.float32)
                 if a["dtype"] == "fp16" else a["x"].astype(np.float32))
        elif t == "conv":
            r = conv(a["x"], a["weight"], a["bias"], a["strides"],
                     a["pad"])
        elif t == "relu":
            r = np.maximum(a["x"], 0)
        elif t == "max_pool":
            r = max_pool(a["x"], a["kernel_sizes"], a["strides"])
        elif t == "reduce_mean":
            axes = tuple(int(v) for v in np.atleast_1d(a["axes"]))
            r = a["x"].mean(axis=axes, keepdims=bool(a["keep_dims"]))
        elif t == "linear":
            r = a["x"] @ np.asarray(a["weight"]).T + a["bias"]
        elif t == "sigmoid":
            r = 1.0 / (1.0 + np.exp(-a["x"]))
        elif t == "mul":
            r = a["x"] * a["y"]
        elif t == "add":
            r = a["x"] + a["y"]
        elif t == "reshape":
            shp = [int(v) if v != 0 else a["x"].shape[i]
                   for i, v in enumerate(np.atleast_1d(a["shape"]))]
            if shp and shp[0] == 1 and n != 1:
                shp[0] = n          # emitted graphs are batch-1 shaped
            r = a["x"].reshape(shp)
        elif t == "identity":
            r = a["x"]
        else:
            raise NotImplementedError(f"MIL op {t!r}")
        env[outs[0]] = r
    return env[out_name]


def verify_numerics(path: str, ckpt_name: str,
                    model_kind: str = "v3", n: int = 16,
                    max_err: float = 0.25) -> float:
    """Execute the emitted program and compare logits vs the flax
    checkpoint on random inputs: 100% argmax agreement required, max
    |logit delta| bounded (fp16 weight storage is the expected error
    source). Returns the measured max error."""
    from sudoku_vision_tpu.ml import checkpoint as ckpt

    variables = ckpt.load_variables_or_none(ckpt_name)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, 28, 28, 1)).astype(np.float32)
    if model_kind == "v3":
        from sudoku_vision_tpu.models.cnn import DigitCNNv3

        t = (ckpt.load_metadata(ckpt_name) or {}).get("temperature")
        want = np.asarray(DigitCNNv3().apply(
            variables, x, temperature=t if t else None))
    else:
        from sudoku_vision_tpu.models.cnn import EmptyClassifier

        want = np.asarray(EmptyClassifier().apply(variables, x))
    got = execute_mlpackage(path, x.transpose(0, 3, 1, 2))
    err = float(np.abs(want - got).max())
    if err > max_err:
        raise ValueError(f"mlpackage numerics off: max err {err}")
    if not (want.argmax(1) == got.argmax(1)).all():
        raise ValueError("mlpackage argmax disagrees with checkpoint")
    return err


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        description="emit + verify a CoreML mlpackage without coremltools")
    p.add_argument("--ckpt", default="digit_cnn_v3_real")
    p.add_argument("--model", default="v3", choices=sorted(_MODELS))
    p.add_argument("--out", default="models_export/DigitClassifier"
                                    ".mlpackage")
    args = p.parse_args(argv)
    emit_mlpackage(args.ckpt, args.out, model_kind=args.model)
    info = walk_mlpackage(args.out)
    n = verify_weights(args.out, args.ckpt, model_kind=args.model)
    err = verify_numerics(args.out, args.ckpt, model_kind=args.model)
    print(json.dumps({k: v for k, v in info.items() if k != "blob_meta"},
                     indent=2))
    print(f"verified {n} weight blobs byte-for-byte vs {args.ckpt}; "
          f"EXECUTED: logits max err {err:.4f} vs flax, argmax 100%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
