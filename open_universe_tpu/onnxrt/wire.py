"""Protobuf wire-format codec for ONNX ModelProto.

Hand-rolled reader/writer for the subset of onnx.proto needed to load and
execute inference models — no `onnx` or `protobuf` package required. The
field numbers follow the public, frozen onnx.proto schema.

Wire format recap: each field is a varint tag ``(field_number << 3) |
wire_type`` with wire types 0 = varint, 1 = fixed64, 2 = length-delimited,
5 = fixed32. Packed repeated scalars arrive as one length-delimited blob.
"""
import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


# ------------------------------------------------------------ wire reader
class Reader:
    def __init__(self, buf: bytes, pos: int = 0, end: Optional[int] = None):
        self.buf = buf
        self.pos = pos
        self.end = len(buf) if end is None else end

    def eof(self) -> bool:
        return self.pos >= self.end

    def varint(self) -> int:
        x = 0
        shift = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            x |= (b & 0x7F) << shift
            if not b & 0x80:
                return x
            shift += 7

    def tag(self):
        t = self.varint()
        return t >> 3, t & 7

    def bytes_(self) -> bytes:
        n = self.varint()
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def skip(self, wire_type: int):
        if wire_type == 0:
            self.varint()
        elif wire_type == 1:
            self.pos += 8
        elif wire_type == 2:
            n = self.varint()  # NB: varint() moves pos; don't fold into +=
            self.pos += n
        elif wire_type == 5:
            self.pos += 4
        else:
            raise ValueError(f"bad wire type {wire_type}")


def _zigzag_signed(x: int) -> int:
    """int64 fields are two's-complement varints (not zigzag) in proto3."""
    if x >= 1 << 63:
        x -= 1 << 64
    return x


def _packed(buf: bytes, fmt: str):
    n = struct.calcsize(fmt)
    return [struct.unpack_from("<" + fmt, buf, i)[0]
            for i in range(0, len(buf), n)]


def _packed_varints(buf: bytes) -> List[int]:
    r = Reader(buf)
    out = []
    while not r.eof():
        out.append(_zigzag_signed(r.varint()))
    return out


# ----------------------------------------------------------- proto models
# onnx TensorProto.DataType values
DT_FLOAT, DT_UINT8, DT_INT8, DT_UINT16, DT_INT16 = 1, 2, 3, 4, 5
DT_INT32, DT_INT64, DT_STRING, DT_BOOL, DT_FLOAT16 = 6, 7, 8, 9, 10
DT_DOUBLE, DT_UINT32, DT_UINT64 = 11, 12, 13

_NP_DTYPE = {
    DT_FLOAT: np.float32, DT_UINT8: np.uint8, DT_INT8: np.int8,
    DT_UINT16: np.uint16, DT_INT16: np.int16, DT_INT32: np.int32,
    DT_INT64: np.int64, DT_BOOL: np.bool_, DT_FLOAT16: np.float16,
    DT_DOUBLE: np.float64, DT_UINT32: np.uint32, DT_UINT64: np.uint64,
}
_DT_FROM_NP = {np.dtype(v): k for k, v in _NP_DTYPE.items()}


@dataclass
class TensorProto:
    dims: List[int] = field(default_factory=list)
    data_type: int = DT_FLOAT
    name: str = ""
    raw_data: bytes = b""
    float_data: List[float] = field(default_factory=list)
    int32_data: List[int] = field(default_factory=list)
    int64_data: List[int] = field(default_factory=list)
    double_data: List[float] = field(default_factory=list)

    def to_numpy(self) -> np.ndarray:
        dt = _NP_DTYPE.get(self.data_type)
        if dt is None:
            raise ValueError(f"unsupported tensor dtype {self.data_type}")
        if self.raw_data:
            a = np.frombuffer(self.raw_data, dtype=dt)
        elif self.float_data:
            a = np.asarray(self.float_data, dtype=dt)
        elif self.int64_data:
            a = np.asarray(self.int64_data, dtype=dt)
        elif self.int32_data:
            a = np.asarray(self.int32_data, dtype=dt)
        elif self.double_data:
            a = np.asarray(self.double_data, dtype=dt)
        else:
            a = np.zeros(0, dtype=dt)
        return a.reshape(self.dims) if self.dims else a.reshape(())


# AttributeProto.AttributeType
AT_FLOAT, AT_INT, AT_STRING, AT_TENSOR, AT_GRAPH = 1, 2, 3, 4, 5
AT_FLOATS, AT_INTS, AT_STRINGS = 6, 7, 8


@dataclass
class AttributeProto:
    name: str = ""
    type: int = 0
    f: float = 0.0
    i: int = 0
    s: bytes = b""
    t: Optional[TensorProto] = None
    g: Optional["GraphProto"] = None
    floats: List[float] = field(default_factory=list)
    ints: List[int] = field(default_factory=list)
    strings: List[bytes] = field(default_factory=list)

    @property
    def value(self):
        if self.type == AT_FLOAT:
            return self.f
        if self.type == AT_INT:
            return self.i
        if self.type == AT_STRING:
            return self.s.decode()
        if self.type == AT_TENSOR:
            return self.t.to_numpy()
        if self.type == AT_GRAPH:
            return self.g
        if self.type == AT_FLOATS:
            return list(self.floats)
        if self.type == AT_INTS:
            return list(self.ints)
        if self.type == AT_STRINGS:
            return [s.decode() for s in self.strings]
        # untyped attributes (some exporters): best effort
        if self.ints:
            return list(self.ints)
        if self.floats:
            return list(self.floats)
        if self.s:
            return self.s.decode()
        return self.i if self.i else self.f


@dataclass
class NodeProto:
    input: List[str] = field(default_factory=list)
    output: List[str] = field(default_factory=list)
    name: str = ""
    op_type: str = ""
    attribute: List[AttributeProto] = field(default_factory=list)

    def attrs(self) -> Dict[str, object]:
        return {a.name: a.value for a in self.attribute}


@dataclass
class ValueInfoProto:
    name: str = ""
    elem_type: int = 0
    shape: List[object] = field(default_factory=list)  # int or str (dim_param)


@dataclass
class GraphProto:
    node: List[NodeProto] = field(default_factory=list)
    name: str = ""
    initializer: List[TensorProto] = field(default_factory=list)
    input: List[ValueInfoProto] = field(default_factory=list)
    output: List[ValueInfoProto] = field(default_factory=list)


@dataclass
class ModelProto:
    ir_version: int = 8
    producer_name: str = ""
    graph: Optional[GraphProto] = None
    opset_version: int = 17


# ------------------------------------------------------------- parse fns
def _parse_tensor(buf: bytes) -> TensorProto:
    r, t = Reader(buf), TensorProto()
    while not r.eof():
        f, wt = r.tag()
        if f == 1:
            if wt == 2:
                t.dims += _packed_varints(r.bytes_())
            else:
                t.dims.append(_zigzag_signed(r.varint()))
        elif f == 2:
            t.data_type = r.varint()
        elif f == 4:
            if wt == 2:
                t.float_data += _packed(r.bytes_(), "f")
            else:
                t.float_data.append(struct.unpack("<f", r.buf[r.pos:r.pos+4])[0]); r.pos += 4
        elif f == 5:
            if wt == 2:
                t.int32_data += _packed_varints(r.bytes_())
            else:
                t.int32_data.append(_zigzag_signed(r.varint()))
        elif f == 7:
            if wt == 2:
                t.int64_data += _packed_varints(r.bytes_())
            else:
                t.int64_data.append(_zigzag_signed(r.varint()))
        elif f == 8:
            t.name = r.bytes_().decode()
        elif f == 9:
            t.raw_data = r.bytes_()
        elif f == 10:
            if wt == 2:
                t.double_data += _packed(r.bytes_(), "d")
            else:
                t.double_data.append(struct.unpack("<d", r.buf[r.pos:r.pos+8])[0]); r.pos += 8
        else:
            r.skip(wt)
    return t


def _parse_attribute(buf: bytes) -> AttributeProto:
    r, a = Reader(buf), AttributeProto()
    while not r.eof():
        f, wt = r.tag()
        if f == 1:
            a.name = r.bytes_().decode()
        elif f == 2:
            a.f = struct.unpack("<f", r.buf[r.pos:r.pos+4])[0]; r.pos += 4
        elif f == 3:
            a.i = _zigzag_signed(r.varint())
        elif f == 4:
            a.s = r.bytes_()
        elif f == 5:
            a.t = _parse_tensor(r.bytes_())
        elif f == 6:
            a.g = _parse_graph(r.bytes_())
        elif f == 7:
            if wt == 2:
                a.floats += _packed(r.bytes_(), "f")
            else:
                a.floats.append(struct.unpack("<f", r.buf[r.pos:r.pos+4])[0]); r.pos += 4
        elif f == 8:
            if wt == 2:
                a.ints += _packed_varints(r.bytes_())
            else:
                a.ints.append(_zigzag_signed(r.varint()))
        elif f == 9:
            a.strings.append(r.bytes_())
        elif f == 20:
            a.type = r.varint()
        else:
            r.skip(wt)
    return a


def _parse_node(buf: bytes) -> NodeProto:
    r, n = Reader(buf), NodeProto()
    while not r.eof():
        f, wt = r.tag()
        if f == 1:
            n.input.append(r.bytes_().decode())
        elif f == 2:
            n.output.append(r.bytes_().decode())
        elif f == 3:
            n.name = r.bytes_().decode()
        elif f == 4:
            n.op_type = r.bytes_().decode()
        elif f == 5:
            n.attribute.append(_parse_attribute(r.bytes_()))
        else:
            r.skip(wt)
    return n


def _parse_value_info(buf: bytes) -> ValueInfoProto:
    r, v = Reader(buf), ValueInfoProto()
    while not r.eof():
        f, wt = r.tag()
        if f == 1:
            v.name = r.bytes_().decode()
        elif f == 2:  # TypeProto
            tr = Reader(r.bytes_())
            while not tr.eof():
                tf, twt = tr.tag()
                if tf == 1:  # tensor_type
                    ttr = Reader(tr.bytes_())
                    while not ttr.eof():
                        ttf, ttwt = ttr.tag()
                        if ttf == 1:
                            v.elem_type = ttr.varint()
                        elif ttf == 2:  # TensorShapeProto
                            sr = Reader(ttr.bytes_())
                            while not sr.eof():
                                sf, swt = sr.tag()
                                if sf == 1:  # Dimension
                                    dr = Reader(sr.bytes_())
                                    dim: object = None
                                    while not dr.eof():
                                        dfn, dwt = dr.tag()
                                        if dfn == 1:
                                            dim = _zigzag_signed(dr.varint())
                                        elif dfn == 2:
                                            dim = dr.bytes_().decode()
                                        else:
                                            dr.skip(dwt)
                                    v.shape.append(dim)
                                else:
                                    sr.skip(swt)
                        else:
                            ttr.skip(ttwt)
                else:
                    tr.skip(twt)
        else:
            r.skip(wt)
    return v


def _parse_graph(buf: bytes) -> GraphProto:
    r, g = Reader(buf), GraphProto()
    while not r.eof():
        f, wt = r.tag()
        if f == 1:
            g.node.append(_parse_node(r.bytes_()))
        elif f == 2:
            g.name = r.bytes_().decode()
        elif f == 5:
            g.initializer.append(_parse_tensor(r.bytes_()))
        elif f == 11:
            g.input.append(_parse_value_info(r.bytes_()))
        elif f == 12:
            g.output.append(_parse_value_info(r.bytes_()))
        else:
            r.skip(wt)
    return g


def parse_model(buf: bytes) -> ModelProto:
    r, m = Reader(buf), ModelProto()
    while not r.eof():
        f, wt = r.tag()
        if f == 1:
            m.ir_version = _zigzag_signed(r.varint())
        elif f == 2:
            m.producer_name = r.bytes_().decode()
        elif f == 7:
            m.graph = _parse_graph(r.bytes_())
        elif f == 8:  # OperatorSetIdProto
            orr = Reader(r.bytes_())
            while not orr.eof():
                of, owt = orr.tag()
                if of == 2:
                    m.opset_version = _zigzag_signed(orr.varint())
                else:
                    orr.skip(owt)
        else:
            r.skip(wt)
    return m


def load_model(path) -> ModelProto:
    with open(path, "rb") as f:
        return parse_model(f.read())


# ------------------------------------------------------------ wire writer
# (used by tests to synthesize models, and handy for exporting graphs)
class Writer:
    def __init__(self):
        self.parts: List[bytes] = []

    def varint(self, x: int):
        if x < 0:
            x += 1 << 64
        out = bytearray()
        while True:
            b = x & 0x7F
            x >>= 7
            if x:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
        self.parts.append(bytes(out))

    def tag(self, field_num: int, wire_type: int):
        self.varint((field_num << 3) | wire_type)

    def bytes_(self, field_num: int, data: bytes):
        self.tag(field_num, 2)
        self.varint(len(data))
        self.parts.append(data)

    def string(self, field_num: int, s: str):
        self.bytes_(field_num, s.encode())

    def int_(self, field_num: int, x: int):
        self.tag(field_num, 0)
        self.varint(x)

    def float_(self, field_num: int, x: float):
        self.tag(field_num, 5)
        self.parts.append(struct.pack("<f", x))

    def msg(self, field_num: int, w: "Writer"):
        self.bytes_(field_num, w.data())

    def data(self) -> bytes:
        return b"".join(self.parts)


def _write_tensor(t: TensorProto) -> Writer:
    w = Writer()
    for d in t.dims:
        w.int_(1, d)
    w.int_(2, t.data_type)
    if t.name:
        w.string(8, t.name)
    if t.raw_data:
        w.bytes_(9, t.raw_data)
    return w


def tensor_from_numpy(a: np.ndarray, name: str = "") -> TensorProto:
    a = np.ascontiguousarray(a)
    return TensorProto(dims=list(a.shape), data_type=_DT_FROM_NP[a.dtype],
                       name=name, raw_data=a.tobytes())


def _write_attribute(a: AttributeProto) -> Writer:
    w = Writer()
    w.string(1, a.name)
    if a.type == AT_FLOAT:
        w.float_(2, a.f)
    elif a.type == AT_INT:
        w.int_(3, a.i)
    elif a.type == AT_STRING:
        w.bytes_(4, a.s)
    elif a.type == AT_TENSOR:
        w.msg(5, _write_tensor(a.t))
    elif a.type == AT_FLOATS:
        for v in a.floats:
            w.float_(7, v)
    elif a.type == AT_INTS:
        for v in a.ints:
            w.int_(8, v)
    elif a.type == AT_STRINGS:
        for v in a.strings:
            w.bytes_(9, v)
    w.int_(20, a.type)
    return w


def attr(name: str, value) -> AttributeProto:
    a = AttributeProto(name=name)
    if isinstance(value, bool):
        a.type, a.i = AT_INT, int(value)
    elif isinstance(value, int):
        a.type, a.i = AT_INT, value
    elif isinstance(value, float):
        a.type, a.f = AT_FLOAT, value
    elif isinstance(value, str):
        a.type, a.s = AT_STRING, value.encode()
    elif isinstance(value, np.ndarray):
        a.type, a.t = AT_TENSOR, tensor_from_numpy(value)
    elif isinstance(value, (list, tuple)):
        if all(isinstance(v, int) for v in value):
            a.type, a.ints = AT_INTS, list(value)
        elif all(isinstance(v, (int, float)) for v in value):
            a.type, a.floats = AT_FLOATS, [float(v) for v in value]
        else:
            a.type, a.strings = AT_STRINGS, [str(v).encode() for v in value]
    else:
        raise TypeError(f"unsupported attribute value {value!r}")
    return a


def _write_node(n: NodeProto) -> Writer:
    w = Writer()
    for s in n.input:
        w.string(1, s)
    for s in n.output:
        w.string(2, s)
    if n.name:
        w.string(3, n.name)
    w.string(4, n.op_type)
    for a in n.attribute:
        w.msg(5, _write_attribute(a))
    return w


def _write_value_info(v: ValueInfoProto) -> Writer:
    w = Writer()
    w.string(1, v.name)
    shape_w = Writer()
    for d in v.shape:
        dim_w = Writer()
        if isinstance(d, int):
            dim_w.int_(1, d)
        elif d is not None:
            dim_w.string(2, str(d))
        shape_w.msg(1, dim_w)
    tt = Writer()
    tt.int_(1, v.elem_type or DT_FLOAT)
    tt.msg(2, shape_w)
    tp = Writer()
    tp.msg(1, tt)
    w.msg(2, tp)
    return w


def _write_graph(g: GraphProto) -> Writer:
    w = Writer()
    for n in g.node:
        w.msg(1, _write_node(n))
    if g.name:
        w.string(2, g.name)
    for t in g.initializer:
        w.msg(5, _write_tensor(t))
    for v in g.input:
        w.msg(11, _write_value_info(v))
    for v in g.output:
        w.msg(12, _write_value_info(v))
    return w


def serialize_model(m: ModelProto) -> bytes:
    w = Writer()
    w.int_(1, m.ir_version)
    if m.producer_name:
        w.string(2, m.producer_name)
    w.msg(7, _write_graph(m.graph))
    ow = Writer()
    ow.string(1, "")
    ow.int_(2, m.opset_version)
    w.msg(8, ow)
    return w.data()


def save_model(m: ModelProto, path):
    with open(path, "wb") as f:
        f.write(serialize_model(m))
