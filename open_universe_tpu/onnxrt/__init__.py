"""Minimal self-contained ONNX runtime (numpy).

Replaces the reference's `onnxruntime` (C++) dependency for the DNSMOS /
PLCMOS metric models (reference metrics/dnsmos/dnsmos_local.py:26,111 and
metrics/plcmos/plc_mos.py:12): a hand-rolled protobuf wire-format parser
for ONNX ModelProto plus a numpy executor covering the CNN/MLP/recurrent
op set those models use. No onnx / onnxruntime imports required.
"""
from .wire import load_model, save_model, ModelProto, GraphProto, NodeProto, TensorProto
from .runner import InferenceSession
