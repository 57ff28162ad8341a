"""In-repo ONNX runtime: wire codec + numpy executor.

Validated three ways: (1) against torch CPU outputs on models exported by
torch's ONNX exporter (an independent writer of the wire format), (2) a
write->parse roundtrip using our own serializer, (3) the DNSMOS/PLCMOS
wrapper paths end-to-end on synthetic models.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _export(net, args, path):
    """torch.onnx.export without the `onnx` package: the final
    _add_onnxscript_fn pass only matters for onnxscript custom fns."""
    import torch.onnx._internal.torchscript_exporter.onnx_proto_utils as opu

    orig = opu._add_onnxscript_fn
    opu._add_onnxscript_fn = lambda proto, custom_opsets: proto
    try:
        torch.onnx.export(net, args, path, input_names=["inp"],
                          output_names=["out"], dynamo=False)
    finally:
        opu._add_onnxscript_fn = orig


def test_cnn_vs_torch(tmp_path):
    import torch.nn as nn

    from open_universe_tpu.onnxrt import InferenceSession

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(1, 8, 3, stride=2, padding=1)
            self.bn = nn.BatchNorm2d(8)
            self.c2 = nn.Conv2d(8, 16, 3, padding=1, groups=2)
            self.pool = nn.MaxPool2d(2)
            self.fc = nn.Linear(16, 5)

        def forward(self, x):
            h = torch.relu(self.bn(self.c1(x)))
            h = torch.relu(self.c2(h))
            h = self.pool(h)
            h = h.mean((2, 3))
            return torch.sigmoid(self.fc(h))

    torch.manual_seed(0)
    net = Net().eval()
    x = torch.randn(2, 1, 32, 40)
    with torch.no_grad():
        ref = net(x).numpy()
    p = str(tmp_path / "m.onnx")
    _export(net, (x,), p)
    sess = InferenceSession(p)
    assert [i.name for i in sess.get_inputs()] == ["inp"]
    out = sess.run(["out"], {"inp": x.numpy()})[0]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_rnn_vs_torch(tmp_path):
    import torch.nn as nn

    from open_universe_tpu.onnxrt import InferenceSession

    class RNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.gru = nn.GRU(12, 16, batch_first=True, bidirectional=True)
            self.lstm = nn.LSTM(32, 8, batch_first=True)
            self.fc = nn.Linear(8, 1)

        def forward(self, x):
            h, _ = self.gru(x)
            h, _ = self.lstm(h)
            return self.fc(h[:, -1])

    torch.manual_seed(1)
    net = RNet().eval()
    x = torch.randn(3, 20, 12)
    with torch.no_grad():
        ref = net(x).numpy()
    p = str(tmp_path / "r.onnx")
    _export(net, (x,), p)
    out = InferenceSession(p).run(["out"], {"inp": x.numpy()})[0]
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_writer_roundtrip():
    from open_universe_tpu.onnxrt import InferenceSession, wire

    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 3)).astype(np.float32)
    g = wire.GraphProto(name="t")
    g.initializer.append(wire.tensor_from_numpy(w, "W"))
    g.input.append(wire.ValueInfoProto(name="x", elem_type=wire.DT_FLOAT,
                                       shape=[None, 3]))
    g.output.append(wire.ValueInfoProto(name="y", elem_type=wire.DT_FLOAT,
                                        shape=[None, 4]))
    g.node.append(wire.NodeProto(input=["W"], output=["Wt"],
                                 op_type="Transpose",
                                 attribute=[wire.attr("perm", [1, 0])]))
    g.node.append(wire.NodeProto(input=["x", "Wt"], output=["xm"],
                                 op_type="MatMul"))
    g.node.append(wire.NodeProto(input=["xm"], output=["y"], op_type="Relu"))
    sess = InferenceSession(wire.serialize_model(wire.ModelProto(graph=g)))
    xv = rng.standard_normal((5, 3)).astype(np.float32)
    y = sess.run(["y"], {"x": xv})[0]
    np.testing.assert_allclose(y, np.maximum(xv @ w.T, 0), rtol=1e-6)


def _tiny_mos_model(input_name, extra_inputs=()):
    """(1,1,T,F)-ish input -> scalar-ish output via GlobalAveragePool."""
    from open_universe_tpu.onnxrt import wire

    g = wire.GraphProto(name="mos")
    g.input.append(wire.ValueInfoProto(name=input_name,
                                       elem_type=wire.DT_FLOAT,
                                       shape=[1, 1, None, None]))
    for name, dim in extra_inputs:
        g.input.append(wire.ValueInfoProto(name=name,
                                           elem_type=wire.DT_FLOAT,
                                           shape=[1, dim]))
    g.output.append(wire.ValueInfoProto(name="mos", elem_type=wire.DT_FLOAT,
                                        shape=[1, 1]))
    g.node.append(wire.NodeProto(input=[input_name], output=["gap"],
                                 op_type="GlobalAveragePool"))
    g.node.append(wire.NodeProto(input=["gap"], output=["flat"],
                                 op_type="Flatten",
                                 attribute=[wire.attr("axis", 1)]))
    g.node.append(wire.NodeProto(input=["flat"], output=["sig"],
                                 op_type="Sigmoid"))
    four = wire.tensor_from_numpy(np.asarray([[4.0]], np.float32), "four")
    g.initializer.append(four)
    g.node.append(wire.NodeProto(input=["sig", "four"], output=["mos"],
                                 op_type="Mul"))
    return wire.ModelProto(graph=g)


def test_plcmos_wrapper_end_to_end(tmp_path):
    from open_universe_tpu.metrics.plcmos import PLCMOSEstimator, stft_features
    from open_universe_tpu.onnxrt import wire

    wire.save_model(_tiny_mos_model("degraded_audio", [("rater_embed", 64)]),
                    tmp_path / "plcmos_v2.onnx")
    est = PLCMOSEstimator(model_dir=tmp_path, embed_rounds=2)
    x = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
    mos = est.run(x, 16000)
    assert 0.0 < mos <= 4.0
    # feature pipeline shape: hop 256, synth framing
    f = stft_features(x)
    assert f.shape[1] == 257 and f.shape[0] == int(np.ceil((16000 + 256) / 256))


def test_dnsmos_wrapper_end_to_end(tmp_path):
    from open_universe_tpu.metrics.dnsmos import ComputeDNSMOS
    from open_universe_tpu.onnxrt import wire

    # sig_bak_ovr model emits 3 raw scores
    g = _tiny_mos_model("input_1").graph
    # reshape mos (1,1) -> broadcast to 3 values via Concat
    g.node.append(wire.NodeProto(input=["mos", "mos", "mos"], output=["raw3"],
                                 op_type="Concat",
                                 attribute=[wire.attr("axis", 1)]))
    g.output[0] = wire.ValueInfoProto(name="raw3", elem_type=wire.DT_FLOAT,
                                      shape=[1, 3])
    wire.save_model(wire.ModelProto(graph=g), tmp_path / "sig_bak_ovr.onnx")
    # p808 model consumes (1, frames, 120) mel features
    g8 = _tiny_mos_model("input_1").graph
    g8.input[0].shape = [1, None, 120]
    g8.node[0] = wire.NodeProto(input=["input_1"], output=["gap"],
                                op_type="ReduceMean",
                                attribute=[wire.attr("axes", [1, 2]),
                                           wire.attr("keepdims", 1)])
    wire.save_model(wire.ModelProto(graph=g8), tmp_path / "model_v8.onnx")
    dns = ComputeDNSMOS(tmp_path)
    x = np.sin(2 * np.pi * 300 * np.arange(32000) / 16000).astype(np.float32)
    out = dns(x, 16000)
    assert set(out) == {"SIG", "BAK", "OVRL", "P808_MOS"}
    assert all(np.isfinite(v) for v in out.values())
