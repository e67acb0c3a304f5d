"""Dependency-free numpy evaluator for the shipped ONNX artifact.

The reference verifies its exported model by running onnx.checker and
then actually inferencing it in the browser (reference ml/export.py:47
verify_onnx; web/src/ml/digitClassifier.ts:54). This image has neither
the `onnx` package nor onnxruntime, so — same pattern as
utils/wasm_vm.py for sudoku.wasm — this module parses the ModelProto
wire format directly and executes the graph in numpy, so the shipped
file's NUMERICS (weights, op semantics, topology) are asserted against
the flax source of truth, not just its structure. A transposed weight
or wrong initializer now fails tests instead of shipping silently.

Scope: exactly the op set torch.onnx emits for the v1/v3 digit
classifiers (Conv / Gemm / Relu / Sigmoid / ReduceMean / Add / Mul /
Reshape / Transpose / Slice / Pad / Concat / Cast / Unsqueeze /
Constant / ConstantOfShape / MaxPool / Flatten / MatMul / Softmax).
Unknown ops raise instead of misexecuting, so exporter drift fails
loudly. ONNX graphs are topologically sorted by spec, so execution is
a single forward pass over the node list.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

# ------------------------------------------------------------- wire format


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    val = shift = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _s64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one message."""
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        fnum, wire = tag >> 3, tag & 7
        if wire == 0:
            val, i = _read_varint(buf, i)
        elif wire == 2:
            n, i = _read_varint(buf, i)
            val = buf[i:i + n]
            i += n
        elif wire == 5:
            val = buf[i:i + 4]
            i += 4
        elif wire == 1:
            val = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield fnum, wire, val


def _packed_varints(val, wire) -> list[int]:
    """A repeated varint field arrives packed (wire 2) or one-per-tag
    (wire 0); normalize to a list of signed int64."""
    if wire == 0:
        return [_s64(val)]
    out, i = [], 0
    while i < len(val):
        v, i = _read_varint(val, i)
        out.append(_s64(v))
    return out


# TensorProto.data_type values we support.
_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32,
           7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64}


def _parse_tensor(buf: bytes) -> np.ndarray:
    """TensorProto → ndarray (raw_data or typed repeated fields)."""
    dims: list[int] = []
    dtype_code = 1
    raw = None
    floats: list[float] = []
    int32s: list[int] = []
    int64s: list[int] = []
    for fnum, wire, val in _fields(buf):
        if fnum == 1:
            dims.extend(_packed_varints(val, wire))
        elif fnum == 2:
            dtype_code = val
        elif fnum == 4:      # float_data (packed fixed32)
            if wire == 5:
                floats.append(struct.unpack("<f", val)[0])
            else:
                floats.extend(np.frombuffer(val, "<f4").tolist())
        elif fnum == 5:
            int32s.extend(_packed_varints(val, wire))
        elif fnum == 7:
            int64s.extend(_packed_varints(val, wire))
        elif fnum == 9:
            raw = val
    dt = _DTYPES.get(dtype_code)
    if dt is None:
        raise ValueError(f"unsupported tensor data_type {dtype_code}")
    if raw is not None:
        arr = np.frombuffer(raw, dtype=np.dtype(dt).newbyteorder("<"))
        arr = arr.astype(dt)
    elif floats:
        arr = np.array(floats, dt)
    elif int64s:
        arr = np.array(int64s, dt)
    elif int32s:
        arr = np.array(int32s, dt)
    else:
        arr = np.zeros(int(np.prod(dims)) if dims else 0, dt)
    return arr.reshape(dims)


@dataclass
class _Node:
    op: str
    inputs: list[str]
    outputs: list[str]
    attrs: dict = field(default_factory=dict)


def _parse_attr(buf: bytes) -> tuple[str, object]:
    name, out = "", None
    ints: list[int] = []
    floats: list[float] = []
    for fnum, wire, val in _fields(buf):
        if fnum == 1:
            name = val.decode()
        elif fnum == 2:      # f
            out = struct.unpack("<f", val)[0]
        elif fnum == 3:      # i
            out = _s64(val)
        elif fnum == 4:      # s
            out = val.decode()
        elif fnum == 5:      # t
            out = _parse_tensor(val)
        elif fnum == 7:      # floats
            floats.extend(np.frombuffer(val, "<f4").tolist()
                          if wire == 2 else
                          [struct.unpack("<f", val)[0]])
        elif fnum == 8:      # ints
            ints.extend(_packed_varints(val, wire))
    if ints:
        out = ints
    elif floats:
        out = floats
    return name, out


class OnnxModel:
    """Parsed + executable ModelProto of the supported profile."""

    def __init__(self, blob: bytes):
        graph = None
        for fnum, _, val in _fields(blob):
            if fnum == 7:
                graph = val
        if graph is None:
            raise ValueError("no graph in ModelProto")
        self.nodes: list[_Node] = []
        self.init: dict[str, np.ndarray] = {}
        self.input_names: list[str] = []
        self.output_names: list[str] = []
        for fnum, _, val in _fields(graph):
            if fnum == 1:        # node
                node = _Node("", [], [])
                for f2, _, v2 in _fields(val):
                    if f2 == 1:
                        node.inputs.append(v2.decode())
                    elif f2 == 2:
                        node.outputs.append(v2.decode())
                    elif f2 == 4:
                        node.op = v2.decode()
                    elif f2 == 5:
                        k, v = _parse_attr(v2)
                        node.attrs[k] = v
                self.nodes.append(node)
            elif fnum == 5:      # initializer
                t = _parse_tensor(val)
                nm = ""
                for f2, _, v2 in _fields(val):
                    if f2 == 8:
                        nm = v2.decode()
                self.init[nm] = t
            elif fnum == 11:     # input (ValueInfoProto.name = field 1)
                for f2, _, v2 in _fields(val):
                    if f2 == 1:
                        self.input_names.append(v2.decode())
            elif fnum == 12:
                for f2, _, v2 in _fields(val):
                    if f2 == 1:
                        self.output_names.append(v2.decode())
        # graph inputs exclude initializers (torch exports them separately
        # in some opsets; filter defensively)
        self.input_names = [n for n in self.input_names
                            if n not in self.init]

    # ---------------------------------------------------------- execution

    def run(self, *args: np.ndarray) -> list[np.ndarray]:
        if len(args) != len(self.input_names):
            raise ValueError(
                f"model takes {self.input_names}, got {len(args)} args")
        env: dict[str, np.ndarray] = dict(self.init)
        for name, a in zip(self.input_names, args):
            env[name] = np.asarray(a)
        for node in self.nodes:
            ins = [env[n] if n else None for n in node.inputs]
            outs = _OPS[node.op](node, ins)
            for name, val in zip(node.outputs, outs):
                env[name] = val
        return [env[n] for n in self.output_names]


# ------------------------------------------------------------------- ops


def _conv(node: _Node, ins):
    x, w = ins[0], ins[1]
    b = ins[2] if len(ins) > 2 else None
    a = node.attrs
    group = a.get("group", 1)
    if group != 1:
        raise NotImplementedError("grouped conv")
    kh, kw = w.shape[2], w.shape[3]
    sh, sw = a.get("strides", [1, 1])
    dh, dw = a.get("dilations", [1, 1])
    pads = a.get("pads", [0, 0, 0, 0])       # [ph0, pw0, ph1, pw1]
    xp = np.pad(x, ((0, 0), (0, 0), (pads[0], pads[2]),
                    (pads[1], pads[3])))
    n, c, hp, wp = xp.shape
    ho = (hp - (dh * (kh - 1) + 1)) // sh + 1
    wo = (wp - (dw * (kw - 1) + 1)) // sw + 1
    cols = np.empty((n, c, kh, kw, ho, wo), x.dtype)
    for i in range(kh):
        for j in range(kw):
            cols[:, :, i, j] = xp[:, :, i * dh:i * dh + ho * sh:sh,
                                  j * dw:j * dw + wo * sw:sw]
    out = np.einsum("nijkhw,mijk->nmhw",
                    cols, w, optimize=True).astype(x.dtype)
    if b is not None:
        out = out + b[None, :, None, None]
    return [out]


def _gemm(node: _Node, ins):
    a, b = ins[0], ins[1]
    c = ins[2] if len(ins) > 2 else None
    at = node.attrs
    if at.get("transA", 0):
        a = a.T
    if at.get("transB", 0):
        b = b.T
    out = at.get("alpha", 1.0) * (a @ b)
    if c is not None:
        out = out + at.get("beta", 1.0) * c
    return [out.astype(ins[0].dtype)]


def _reduce_mean(node: _Node, ins):
    axes = node.attrs.get("axes")
    keep = bool(node.attrs.get("keepdims", 1))
    axes = tuple(axes) if axes is not None else None
    return [np.mean(ins[0], axis=axes, keepdims=keep,
                    dtype=ins[0].dtype)]


def _maxpool(node: _Node, ins):
    x = ins[0]
    kh, kw = node.attrs["kernel_shape"]
    sh, sw = node.attrs.get("strides", [kh, kw])
    pads = node.attrs.get("pads", [0, 0, 0, 0])
    if any(pads):
        x = np.pad(x, ((0, 0), (0, 0), (pads[0], pads[2]),
                       (pads[1], pads[3])),
                   constant_values=-np.inf)
    n, c, h, w = x.shape
    ho = (h - kh) // sh + 1
    wo = (w - kw) // sw + 1
    out = np.full((n, c, ho, wo), -np.inf, x.dtype)
    for i in range(kh):
        for j in range(kw):
            np.maximum(out, x[:, :, i:i + ho * sh:sh, j:j + wo * sw:sw],
                       out=out)
    return [out]


def _slice(node: _Node, ins):
    data = ins[0]
    starts = ins[1].tolist()
    ends = ins[2].tolist()
    axes = (ins[3].tolist() if len(ins) > 3 and ins[3] is not None
            else list(range(len(starts))))
    steps = (ins[4].tolist() if len(ins) > 4 and ins[4] is not None
             else [1] * len(starts))
    sl = [slice(None)] * data.ndim
    for s, e, ax, st in zip(starts, ends, axes, steps):
        sl[ax] = slice(s, e, st)
    return [data[tuple(sl)]]


def _pad(node: _Node, ins):
    data, pads = ins[0], ins[1].tolist()
    cval = float(ins[2]) if len(ins) > 2 and ins[2] is not None else 0.0
    mode = node.attrs.get("mode", "constant")
    if isinstance(mode, bytes):
        mode = mode.decode()
    r = data.ndim
    width = [(pads[i], pads[i + r]) for i in range(r)]
    if mode == "constant":
        return [np.pad(data, width, constant_values=cval)]
    if mode == "edge":        # torch 'replicate' (the bundle preproc)
        return [np.pad(data, width, mode="edge")]
    if mode == "reflect":
        return [np.pad(data, width, mode="reflect")]
    raise NotImplementedError(f"pad mode {mode!r}")


def _reshape(node: _Node, ins):
    data, shape = ins[0], ins[1].tolist()
    shape = [data.shape[i] if s == 0 else s for i, s in enumerate(shape)]
    return [data.reshape(shape)]


def _cast(node: _Node, ins):
    return [ins[0].astype(_DTYPES[node.attrs["to"]])]


def _softmax(node: _Node, ins):
    x = ins[0]
    ax = node.attrs.get("axis", -1)
    e = np.exp(x - np.max(x, axis=ax, keepdims=True))
    return [e / np.sum(e, axis=ax, keepdims=True)]


_OPS = {
    "Conv": _conv,
    "Gemm": _gemm,
    "MatMul": lambda n, i: [i[0] @ i[1]],
    "Relu": lambda n, i: [np.maximum(i[0], 0)],
    # numerically stable in both tails (corruption tests drive |x| large)
    "Sigmoid": lambda n, i: [np.piecewise(
        i[0], [i[0] >= 0],
        [lambda v: 1.0 / (1.0 + np.exp(-v)),
         lambda v: np.exp(v) / (1.0 + np.exp(v))])],
    "Softmax": _softmax,
    "ReduceMean": _reduce_mean,
    "MaxPool": _maxpool,
    "Add": lambda n, i: [i[0] + i[1]],
    "Mul": lambda n, i: [i[0] * i[1]],
    "Div": lambda n, i: [i[0] / i[1]],
    "Sub": lambda n, i: [i[0] - i[1]],
    "Reshape": _reshape,
    "Flatten": lambda n, i: [i[0].reshape(
        int(np.prod(i[0].shape[:n.attrs.get("axis", 1)])), -1)],
    "Transpose": lambda n, i: [np.transpose(i[0], n.attrs["perm"])],
    "Unsqueeze": lambda n, i: [np.expand_dims(
        i[0], tuple(int(a) for a in i[1]))],
    "Squeeze": lambda n, i: [np.squeeze(
        i[0], tuple(int(a) for a in i[1]) if len(i) > 1 else None)],
    "Concat": lambda n, i: [np.concatenate(i, axis=n.attrs["axis"])],
    "Slice": _slice,
    "Pad": _pad,
    "Cast": _cast,
    "Constant": lambda n, i: [n.attrs["value"]],
    "ConstantOfShape": lambda n, i: [np.full(
        i[0].astype(np.int64).tolist(),
        n.attrs["value"].reshape(-1)[0] if "value" in n.attrs
        else np.float32(0))],
    "Identity": lambda n, i: [i[0]],
    "Shape": lambda n, i: [np.array(i[0].shape, np.int64)],
    "Gather": lambda n, i: [np.take(i[0], i[1].astype(np.int64),
                                    axis=n.attrs.get("axis", 0))],
    # round-5 additions for the empty-gated bundle graph
    # (ml/export.py::build_torch_bundle: raw-cell input, embedded
    # preproc, Greater/Where select between gate and flagship)
    "Greater": lambda n, i: [i[0] > i[1]],
    "Less": lambda n, i: [i[0] < i[1]],
    "Where": lambda n, i: [np.where(i[0], i[1], i[2])],
    "Floor": lambda n, i: [np.floor(i[0])],
    "Not": lambda n, i: [~i[0]],
}


def _missing(node: _Node, ins):
    raise NotImplementedError(f"unsupported op {node.op}")


class _OpTable(dict):
    def __missing__(self, key):
        return lambda n, i: _missing(n, i)


_OPS = _OpTable(_OPS)


def load(path: str) -> OnnxModel:
    with open(path, "rb") as fh:
        return OnnxModel(fh.read())


def run_file(path: str, x: np.ndarray) -> np.ndarray:
    """Execute the model file on one input batch, return first output."""
    return load(path).run(x)[0]
