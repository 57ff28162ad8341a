"""Numpy executor for ONNX inference graphs.

API mirrors onnxruntime's ``InferenceSession`` (construct from a path or
bytes; ``get_inputs()``; ``run(output_names, feed)``) so the DNSMOS /
PLCMOS wrappers can swap between the real runtime and this one. Covers
the CNN / MLP / recurrent op set of the metric models; unsupported ops
raise with the op name so gaps are explicit.
"""
from typing import Dict, List, Optional

import numpy as np

from .wire import (DT_FLOAT, _NP_DTYPE, ModelProto, load_model, parse_model)


def _pair(v, n=2):
    if v is None:
        return (1,) * n
    v = list(v)
    return tuple(v) if len(v) == n else tuple(v) * n


def _conv_out_len(t, k, s, p0, p1, d):
    return (t + p0 + p1 - d * (k - 1) - 1) // s + 1


def _auto_pads(auto_pad, x_shape, kernel, strides, dilations, nsp):
    """Resolve SAME_UPPER/SAME_LOWER into explicit pads."""
    pads = []
    for i in range(nsp):
        t = x_shape[2 + i]
        out = -(-t // strides[i])  # ceil
        eff = dilations[i] * (kernel[i] - 1) + 1
        total = max(0, (out - 1) * strides[i] + eff - t)
        if auto_pad == "SAME_LOWER":
            pads.append((total - total // 2, total // 2))
        else:
            pads.append((total // 2, total - total // 2))
    return pads


def _conv(x, w, b, attrs):
    """Conv for 1-D (N,C,T) and 2-D (N,C,H,W) with groups/dilations."""
    nsp = x.ndim - 2
    kernel = list(attrs.get("kernel_shape", w.shape[2:]))
    strides = _pair(attrs.get("strides"), nsp)
    dilations = _pair(attrs.get("dilations"), nsp)
    group = int(attrs.get("group", 1))
    auto_pad = attrs.get("auto_pad", b"")
    if isinstance(auto_pad, bytes):
        auto_pad = auto_pad.decode()
    if auto_pad and auto_pad.startswith("SAME"):
        pads = _auto_pads(auto_pad, x.shape, kernel, strides, dilations, nsp)
    else:
        p = list(attrs.get("pads", [0] * (2 * nsp)))
        pads = [(p[i], p[i + nsp]) for i in range(nsp)]

    x = np.pad(x, [(0, 0), (0, 0)] + pads)
    N, C = x.shape[:2]
    M = w.shape[0]
    cg = C // group
    mg = M // group

    if nsp == 1:
        T = x.shape[2]
        k, s, d = kernel[0], strides[0], dilations[0]
        ot = (T - d * (k - 1) - 1) // s + 1
        out = np.zeros((N, M, ot), dtype=np.float32)
        # im2col over the single spatial dim
        idx = (np.arange(ot)[:, None] * s + np.arange(k)[None, :] * d)  # (ot,k)
        for g in range(group):
            xg = x[:, g * cg:(g + 1) * cg]  # (N,cg,T)
            cols = xg[:, :, idx]  # (N,cg,ot,k)
            cols = cols.transpose(0, 2, 1, 3).reshape(N, ot, cg * k)
            wg = w[g * mg:(g + 1) * mg].reshape(mg, cg * k)
            out[:, g * mg:(g + 1) * mg] = np.einsum(
                "ntk,mk->nmt", cols, wg, optimize=True)
    elif nsp == 2:
        H, W = x.shape[2:]
        kh, kw = kernel
        sh, sw = strides
        dh, dw = dilations
        oh = (H - dh * (kh - 1) - 1) // sh + 1
        ow = (W - dw * (kw - 1) - 1) // sw + 1
        out = np.zeros((N, M, oh, ow), dtype=np.float32)
        ih = np.arange(oh)[:, None] * sh + np.arange(kh)[None, :] * dh
        iw = np.arange(ow)[:, None] * sw + np.arange(kw)[None, :] * dw
        for g in range(group):
            xg = x[:, g * cg:(g + 1) * cg]
            # (N,cg,oh,kh,ow,kw)
            cols = xg[:, :, ih[:, :, None, None], iw[None, None, :, :]]
            cols = cols.transpose(0, 2, 4, 1, 3, 5).reshape(
                N, oh, ow, cg * kh * kw)
            wg = w[g * mg:(g + 1) * mg].reshape(mg, cg * kh * kw)
            out[:, g * mg:(g + 1) * mg] = np.einsum(
                "nhwk,mk->nmhw", cols, wg, optimize=True)
    else:
        raise NotImplementedError(f"Conv {nsp}-D")
    if b is not None:
        out += b.reshape((1, -1) + (1,) * nsp)
    return out


def _pool(x, attrs, mode):
    nsp = x.ndim - 2
    kernel = list(attrs["kernel_shape"])
    strides = _pair(attrs.get("strides", kernel), nsp)
    auto_pad = attrs.get("auto_pad", b"")
    if isinstance(auto_pad, bytes):
        auto_pad = auto_pad.decode()
    if auto_pad and auto_pad.startswith("SAME"):
        pads = _auto_pads(auto_pad, x.shape, kernel, strides, (1,) * nsp, nsp)
    else:
        p = list(attrs.get("pads", [0] * (2 * nsp)))
        pads = [(p[i], p[i + nsp]) for i in range(nsp)]
    fill = -np.inf if mode == "max" else 0.0
    xp = np.pad(x, [(0, 0), (0, 0)] + pads, constant_values=fill)
    count_include_pad = int(attrs.get("count_include_pad", 0))

    if nsp == 1:
        k, s = kernel[0], strides[0]
        ot = (xp.shape[2] - k) // s + 1
        idx = np.arange(ot)[:, None] * s + np.arange(k)[None, :]
        cols = xp[:, :, idx]
        out = cols.max(-1) if mode == "max" else cols.mean(-1)
        if mode == "avg" and not count_include_pad and any(
                p != (0, 0) for p in pads):
            ones = np.pad(np.ones(x.shape[2:]), pads)[idx]
            out = cols.sum(-1) / np.maximum(ones.sum(-1), 1)
    elif nsp == 2:
        kh, kw = kernel
        sh, sw = strides
        oh = (xp.shape[2] - kh) // sh + 1
        ow = (xp.shape[3] - kw) // sw + 1
        ih = np.arange(oh)[:, None] * sh + np.arange(kh)[None, :]
        iw = np.arange(ow)[:, None] * sw + np.arange(kw)[None, :]
        cols = xp[:, :, ih[:, :, None, None], iw[None, None, :, :]]
        if mode == "max":
            out = cols.max((3, 5))
        else:
            if count_include_pad or all(p == (0, 0) for p in pads):
                out = cols.mean((3, 5))
            else:
                ones = np.pad(np.ones(x.shape[2:]), pads)
                cnt = ones[ih[:, :, None, None], iw[None, None, :, :]].sum((1, 3))
                out = cols.sum((3, 5)) / np.maximum(cnt, 1)
    else:
        raise NotImplementedError(f"{mode}Pool {nsp}-D")
    return out.astype(np.float32)


def _sigmoid(x):
    return np.where(x >= 0, 1.0 / (1.0 + np.exp(-np.clip(x, -60, 60))),
                    np.exp(np.clip(x, -60, 60)) /
                    (1.0 + np.exp(np.clip(x, -60, 60)))).astype(x.dtype)


def _rnn_gate_slices(n, hidden):
    return [slice(i * hidden, (i + 1) * hidden) for i in range(n)]


def _lstm(x, w, r, b, seq_lens, h0, c0, attrs):
    """ONNX LSTM: x (T,N,I); W (D,4H,I); R (D,4H,H); B (D,8H). Gate order
    iofc. Returns (Y (T,D,N,H), Yh (D,N,H), Yc)."""
    hidden = int(attrs["hidden_size"])
    direction = attrs.get("direction", b"forward")
    if isinstance(direction, bytes):
        direction = direction.decode()
    dirs = 2 if direction == "bidirectional" else 1
    T, N, _ = x.shape
    Y = np.zeros((T, dirs, N, hidden), np.float32)
    Yh = np.zeros((dirs, N, hidden), np.float32)
    Yc = np.zeros((dirs, N, hidden), np.float32)
    for d in range(dirs):
        rev = (direction == "reverse") or d == 1
        Wd, Rd = w[d], r[d]
        Bd = b[d] if b is not None else np.zeros(8 * hidden, np.float32)
        wb, rb = Bd[:4 * hidden], Bd[4 * hidden:]
        h = h0[d].copy() if h0 is not None else np.zeros((N, hidden), np.float32)
        c = c0[d].copy() if c0 is not None else np.zeros((N, hidden), np.float32)
        sl_i, sl_o, sl_f, sl_c = _rnn_gate_slices(4, hidden)
        steps = range(T - 1, -1, -1) if rev else range(T)
        for t in steps:
            g = x[t] @ Wd.T + h @ Rd.T + wb + rb
            i = _sigmoid(g[:, sl_i])
            o = _sigmoid(g[:, sl_o])
            f = _sigmoid(g[:, sl_f])
            cc = np.tanh(g[:, sl_c])
            c = f * c + i * cc
            h = o * np.tanh(c)
            Y[t, d] = h
        Yh[d], Yc[d] = h, c
    return Y, Yh, Yc


def _gru(x, w, r, b, seq_lens, h0, attrs):
    """ONNX GRU: gate order zrh; linear_before_reset per attr."""
    hidden = int(attrs["hidden_size"])
    direction = attrs.get("direction", b"forward")
    if isinstance(direction, bytes):
        direction = direction.decode()
    lbr = int(attrs.get("linear_before_reset", 0))
    dirs = 2 if direction == "bidirectional" else 1
    T, N, _ = x.shape
    Y = np.zeros((T, dirs, N, hidden), np.float32)
    Yh = np.zeros((dirs, N, hidden), np.float32)
    for d in range(dirs):
        rev = (direction == "reverse") or d == 1
        Wd, Rd = w[d], r[d]
        Bd = b[d] if b is not None else np.zeros(6 * hidden, np.float32)
        wb, rb = Bd[:3 * hidden], Bd[3 * hidden:]
        h = h0[d].copy() if h0 is not None else np.zeros((N, hidden), np.float32)
        sl_z, sl_r, sl_h = _rnn_gate_slices(3, hidden)
        steps = range(T - 1, -1, -1) if rev else range(T)
        for t in steps:
            gx = x[t] @ Wd.T + wb
            gh = h @ Rd.T
            z = _sigmoid(gx[:, sl_z] + gh[:, sl_z] + rb[sl_z])
            rr = _sigmoid(gx[:, sl_r] + gh[:, sl_r] + rb[sl_r])
            if lbr:
                hh = np.tanh(gx[:, sl_h] + rr * (gh[:, sl_h] + rb[sl_h]))
            else:
                hh = np.tanh(gx[:, sl_h] + (rr * h) @ Rd[sl_h].T + rb[sl_h])
            h = (1 - z) * hh + z * h
            Y[t, d] = h
        Yh[d] = h
    return Y, Yh


class _IOInfo:
    def __init__(self, name, shape, elem_type):
        self.name = name
        self.shape = shape
        self.type = f"tensor({np.dtype(_NP_DTYPE.get(elem_type, np.float32)).name})"


class InferenceSession:
    """Drop-in stand-in for onnxruntime.InferenceSession (CPU, numpy)."""

    def __init__(self, model, providers=None, sess_options=None):
        if isinstance(model, (bytes, bytearray)):
            self.model: ModelProto = parse_model(bytes(model))
        else:
            self.model = load_model(model)
        g = self.model.graph
        self.initializers: Dict[str, np.ndarray] = {
            t.name: t.to_numpy() for t in g.initializer}
        self._inputs = [
            _IOInfo(v.name, [d if isinstance(d, int) else None for d in v.shape],
                    v.elem_type)
            for v in g.input if v.name not in self.initializers]
        self._outputs = [
            _IOInfo(v.name, [d if isinstance(d, int) else None for d in v.shape],
                    v.elem_type)
            for v in g.output]

    def get_inputs(self) -> List[_IOInfo]:
        return self._inputs

    def get_outputs(self) -> List[_IOInfo]:
        return self._outputs

    def run(self, output_names: Optional[List[str]], feed: Dict[str, np.ndarray]):
        vals: Dict[str, np.ndarray] = dict(self.initializers)
        for k, v in feed.items():
            vals[k] = np.asarray(v)
        for node in self.model.graph.node:
            self._exec(node, vals)
        if output_names is None:
            output_names = [o.name for o in self._outputs]
        return [vals[n] for n in output_names]

    # ------------------------------------------------------------ op impl
    def _exec(self, node, vals):
        op = node.op_type
        attrs = node.attrs()
        x = [vals[n] if n else None for n in node.input]

        def out(*arrays):
            for name, a in zip(node.output, arrays):
                if name:
                    vals[name] = a

        if op == "Conv":
            out(_conv(x[0].astype(np.float32), x[1],
                      x[2] if len(x) > 2 else None, attrs))
        elif op == "Gemm":
            a, b = x[0], x[1]
            if int(attrs.get("transA", 0)):
                a = a.T
            if int(attrs.get("transB", 0)):
                b = b.T
            y = float(attrs.get("alpha", 1.0)) * (a @ b)
            if len(x) > 2 and x[2] is not None:
                y = y + float(attrs.get("beta", 1.0)) * x[2]
            out(y)
        elif op == "MatMul":
            out(x[0] @ x[1])
        elif op == "Relu":
            out(np.maximum(x[0], 0))
        elif op == "LeakyRelu":
            alpha = float(attrs.get("alpha", 0.01))
            out(np.where(x[0] >= 0, x[0], alpha * x[0]))
        elif op == "Elu":
            alpha = float(attrs.get("alpha", 1.0))
            out(np.where(x[0] >= 0, x[0], alpha * (np.exp(x[0]) - 1)))
        elif op == "Sigmoid":
            out(_sigmoid(x[0]))
        elif op == "Tanh":
            out(np.tanh(x[0]))
        elif op == "Softmax":
            ax = int(attrs.get("axis", -1))
            e = np.exp(x[0] - x[0].max(axis=ax, keepdims=True))
            out(e / e.sum(axis=ax, keepdims=True))
        elif op == "LogSoftmax":
            ax = int(attrs.get("axis", -1))
            m = x[0] - x[0].max(axis=ax, keepdims=True)
            out(m - np.log(np.exp(m).sum(axis=ax, keepdims=True)))
        elif op == "Erf":
            from scipy.special import erf
            out(erf(x[0]))
        elif op in ("Add", "Sub", "Mul", "Div", "Pow"):
            f = {"Add": np.add, "Sub": np.subtract, "Mul": np.multiply,
                 "Div": np.divide, "Pow": np.power}[op]
            out(f(x[0], x[1]))
        elif op in ("Sqrt", "Exp", "Log", "Neg", "Abs", "Floor", "Ceil"):
            f = {"Sqrt": np.sqrt, "Exp": np.exp, "Log": np.log,
                 "Neg": np.negative, "Abs": np.abs, "Floor": np.floor,
                 "Ceil": np.ceil}[op]
            out(f(x[0]))
        elif op == "Clip":
            lo = x[1] if len(x) > 2 and x[1] is not None else attrs.get("min", -np.inf)
            hi = x[2] if len(x) > 2 and x[2] is not None else attrs.get("max", np.inf)
            out(np.clip(x[0], lo, hi))
        elif op in ("Identity", "Dropout"):
            out(x[0])
        elif op == "Cast":
            out(x[0].astype(_NP_DTYPE[int(attrs["to"])]))
        elif op == "Reshape":
            shape = [int(v) for v in x[1]]
            if 0 in shape:
                shape = [x[0].shape[i] if s == 0 else s
                         for i, s in enumerate(shape)]
            out(x[0].reshape(shape))
        elif op == "Flatten":
            ax = int(attrs.get("axis", 1))
            out(x[0].reshape(int(np.prod(x[0].shape[:ax], initial=1)), -1))
        elif op == "Transpose":
            perm = attrs.get("perm")
            out(np.transpose(x[0], perm))
        elif op == "Squeeze":
            axes = (list(x[1]) if len(x) > 1 and x[1] is not None
                    else attrs.get("axes"))
            out(np.squeeze(x[0], tuple(int(a) for a in axes) if axes else None))
        elif op == "Unsqueeze":
            axes = (list(x[1]) if len(x) > 1 and x[1] is not None
                    else attrs["axes"])
            y = x[0]
            for a in sorted(int(v) if int(v) >= 0 else int(v) + y.ndim + 1
                            for v in axes):
                y = np.expand_dims(y, a)
            out(y)
        elif op == "Concat":
            out(np.concatenate([v for v in x], axis=int(attrs["axis"])))
        elif op == "Split":
            ax = int(attrs.get("axis", 0))
            if len(x) > 1 and x[1] is not None:
                sizes = [int(v) for v in x[1]]
            elif "split" in attrs:
                sizes = [int(v) for v in attrs["split"]]
            else:
                n = len(node.output)
                sizes = [x[0].shape[ax] // n] * n
            out(*np.split(x[0], np.cumsum(sizes)[:-1], axis=ax))
        elif op == "Slice":
            if len(x) > 1:  # opset >= 10: inputs
                starts = [int(v) for v in x[1]]
                ends = [int(v) for v in x[2]]
                axes = ([int(v) for v in x[3]] if len(x) > 3 and x[3] is not None
                        else list(range(len(starts))))
                steps = ([int(v) for v in x[4]] if len(x) > 4 and x[4] is not None
                         else [1] * len(starts))
            else:
                starts = [int(v) for v in attrs["starts"]]
                ends = [int(v) for v in attrs["ends"]]
                axes = [int(v) for v in attrs.get("axes", range(len(starts)))]
                steps = [1] * len(starts)
            sl = [slice(None)] * x[0].ndim
            for a, s, e, st in zip(axes, starts, ends, steps):
                sl[a] = slice(s, e, st)
            out(x[0][tuple(sl)])
        elif op == "Gather":
            out(np.take(x[0], x[1].astype(np.int64), axis=int(attrs.get("axis", 0))))
        elif op == "Shape":
            out(np.asarray(x[0].shape, dtype=np.int64))
        elif op == "Expand":
            out(np.broadcast_to(x[0], np.broadcast_shapes(
                x[0].shape, tuple(int(v) for v in x[1]))).copy())
        elif op == "Tile":
            out(np.tile(x[0], [int(v) for v in x[1]]))
        elif op == "Constant":
            if "value" in attrs:
                out(attrs["value"])
            elif "value_float" in attrs:
                out(np.asarray(attrs["value_float"], np.float32))
            elif "value_int" in attrs:
                out(np.asarray(attrs["value_int"], np.int64))
            elif "value_floats" in attrs:
                out(np.asarray(attrs["value_floats"], np.float32))
            elif "value_ints" in attrs:
                out(np.asarray(attrs["value_ints"], np.int64))
            else:
                raise NotImplementedError("Constant without value")
        elif op == "ConstantOfShape":
            v = attrs.get("value")
            fill = v.reshape(-1)[0] if isinstance(v, np.ndarray) else 0.0
            dt = v.dtype if isinstance(v, np.ndarray) else np.float32
            out(np.full([int(s) for s in x[0]], fill, dtype=dt))
        elif op == "Range":
            out(np.arange(int(x[0]), int(x[1]), int(x[2]), dtype=np.int64)
                if np.issubdtype(np.asarray(x[0]).dtype, np.integer)
                else np.arange(float(x[0]), float(x[1]), float(x[2]),
                               dtype=np.float32))
        elif op in ("ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin",
                    "ReduceProd"):
            if len(x) > 1 and x[1] is not None:
                axes = tuple(int(v) for v in x[1])
            else:
                axes = tuple(int(v) for v in attrs.get("axes", ())) or None
            keep = bool(attrs.get("keepdims", 1))
            f = {"ReduceMean": np.mean, "ReduceSum": np.sum,
                 "ReduceMax": np.max, "ReduceMin": np.min,
                 "ReduceProd": np.prod}[op]
            out(f(x[0], axis=axes, keepdims=keep))
        elif op == "ArgMax":
            ax = int(attrs.get("axis", 0))
            y = np.argmax(x[0], axis=ax)
            if bool(attrs.get("keepdims", 1)):
                y = np.expand_dims(y, ax)
            out(y.astype(np.int64))
        elif op == "MaxPool":
            out(_pool(x[0], attrs, "max"))
        elif op == "AveragePool":
            out(_pool(x[0], attrs, "avg"))
        elif op == "GlobalAveragePool":
            out(x[0].mean(axis=tuple(range(2, x[0].ndim)), keepdims=True))
        elif op == "GlobalMaxPool":
            out(x[0].max(axis=tuple(range(2, x[0].ndim)), keepdims=True))
        elif op == "BatchNormalization":
            scale, bias, mean, var = x[1], x[2], x[3], x[4]
            eps = float(attrs.get("epsilon", 1e-5))
            shp = (1, -1) + (1,) * (x[0].ndim - 2)
            out(((x[0] - mean.reshape(shp)) /
                 np.sqrt(var.reshape(shp) + eps)) * scale.reshape(shp)
                + bias.reshape(shp))
        elif op == "LayerNormalization":
            ax = int(attrs.get("axis", -1))
            eps = float(attrs.get("epsilon", 1e-5))
            axes = tuple(range(ax if ax >= 0 else x[0].ndim + ax, x[0].ndim))
            m = x[0].mean(axis=axes, keepdims=True)
            v = x[0].var(axis=axes, keepdims=True)
            y = (x[0] - m) / np.sqrt(v + eps) * x[1]
            if len(x) > 2 and x[2] is not None:
                y = y + x[2]
            out(y)
        elif op == "InstanceNormalization":
            eps = float(attrs.get("epsilon", 1e-5))
            axes = tuple(range(2, x[0].ndim))
            m = x[0].mean(axis=axes, keepdims=True)
            v = x[0].var(axis=axes, keepdims=True)
            shp = (1, -1) + (1,) * (x[0].ndim - 2)
            out((x[0] - m) / np.sqrt(v + eps) * x[1].reshape(shp)
                + x[2].reshape(shp))
        elif op == "Pad":
            mode = attrs.get("mode", b"constant")
            if isinstance(mode, bytes):
                mode = mode.decode()
            if len(x) > 1 and x[1] is not None:
                p = [int(v) for v in x[1]]
                cval = float(x[2]) if len(x) > 2 and x[2] is not None else 0.0
            else:
                p = [int(v) for v in attrs["pads"]]
                cval = float(attrs.get("value", 0.0))
            nd = x[0].ndim
            pads = [(p[i], p[i + nd]) for i in range(nd)]
            if mode == "constant":
                out(np.pad(x[0], pads, constant_values=cval))
            else:
                out(np.pad(x[0], pads, mode={"reflect": "reflect",
                                             "edge": "edge"}[mode]))
        elif op == "LSTM":
            b = x[3] if len(x) > 3 else None
            seq = x[4] if len(x) > 4 else None
            h0 = x[5] if len(x) > 5 else None
            c0 = x[6] if len(x) > 6 else None
            out(*_lstm(x[0], x[1], x[2], b, seq, h0, c0, attrs))
        elif op == "GRU":
            b = x[3] if len(x) > 3 else None
            seq = x[4] if len(x) > 4 else None
            h0 = x[5] if len(x) > 5 else None
            out(*_gru(x[0], x[1], x[2], b, seq, h0, attrs))
        elif op in ("Greater", "Less", "Equal"):
            f = {"Greater": np.greater, "Less": np.less,
                 "Equal": np.equal}[op]
            out(f(x[0], x[1]))
        elif op == "Where":
            out(np.where(x[0], x[1], x[2]))
        elif op == "Not":
            out(np.logical_not(x[0]))
        elif op == "Min":
            y = x[0]
            for v in x[1:]:
                y = np.minimum(y, v)
            out(y)
        elif op == "Max":
            y = x[0]
            for v in x[1:]:
                y = np.maximum(y, v)
            out(y)
        elif op == "Mean":
            out(sum(x) / len(x))
        elif op == "Sum":
            out(sum(x))
        elif op == "ReduceL2":
            axes = tuple(int(v) for v in attrs.get("axes", ())) or None
            keep = bool(attrs.get("keepdims", 1))
            out(np.sqrt(np.sum(np.square(x[0]), axis=axes, keepdims=keep)))
        else:
            raise NotImplementedError(
                f"ONNX op '{op}' is not implemented in open_universe_tpu.onnxrt")
