"""KServe v2 gRPC serving tests: a real grpc server + channel round-trip
(the reference serves Predict over TF-Serving/Triton gRPC frames —
serving/processor/serving/model_serving.h; here the open v2 protocol).
Scores must match the Processor's direct predict bit-for-bit, for both
typed contents and packed raw_input_contents (tritonclient's wire form).
"""

import numpy as np
import pytest

from deeprec_tpu.serve.processor import Processor
from deeprec_tpu.serve.protos import grpc_predict_v2_pb2 as pb
from tests.test_serving import _train_and_save

grpc = pytest.importorskip("grpc")


def _call(channel, method, req, resp_cls):
    fn = channel.unary_unary(
        f"/inference.GRPCInferenceService/{method}",
        request_serializer=lambda m: m.SerializeToString(),
        response_deserializer=resp_cls.FromString)
    return fn(req, timeout=30)


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("grpc_ckpt")
    model, tr, state, it = _train_and_save(tmp)
    p = Processor(model, {"session_num": 1, "bucket_sizes": [64],
                          "warmup": False})
    p.initialize(str(tmp))
    from deeprec_tpu.serve.grpc_server import GrpcInferenceServer

    srv = GrpcInferenceServer(p, port=0).start()
    ch = grpc.insecure_channel(f"127.0.0.1:{srv.port}")
    yield model, p, srv, ch, it
    ch.close()
    srv.stop()
    p.shutdown()


def test_health_and_metadata(served):
    model, p, srv, ch, it = served
    assert _call(ch, "ServerLive", pb.ServerLiveRequest(),
                 pb.ServerLiveResponse).live
    assert _call(ch, "ServerReady", pb.ServerReadyRequest(),
                 pb.ServerReadyResponse).ready
    assert _call(ch, "ModelReady", pb.ModelReadyRequest(name=model.name),
                 pb.ModelReadyResponse).ready
    assert not _call(ch, "ModelReady", pb.ModelReadyRequest(name="nope"),
                     pb.ModelReadyResponse).ready
    meta = _call(ch, "ModelMetadata", pb.ModelMetadataRequest(name=model.name),
                 pb.ModelMetadataResponse)
    assert meta.name == model.name and meta.platform == "deeprec_tpu"
    names = {t.name for t in meta.inputs}
    assert "dense" in names and len(meta.outputs) == 1


def _infer_request(model, b, n, raw):
    req = pb.ModelInferRequest(model_name=model.name, id="r1")
    tensors = [("dense", "FP32", np.asarray(b["dense"][:n], np.float32))]
    tensors += [(k, "INT32", np.asarray(v[:n], np.int32))
                for k, v in sorted(b["cat"].items())]
    for name, dt, arr in tensors:
        t = req.inputs.add()
        t.name, t.datatype = name, dt
        t.shape.extend(arr.shape)
        if raw:
            req.raw_input_contents.append(
                np.ascontiguousarray(arr).astype(
                    arr.dtype.newbyteorder("<")).tobytes())
        else:
            field = ("fp32_contents" if dt == "FP32" else "int_contents")
            getattr(t.contents, field).extend(arr.reshape(-1).tolist())
    return req


@pytest.mark.parametrize("raw", [False, True])
def test_model_infer_matches_direct_predict(served, raw):
    model, p, srv, ch, it = served
    b = next(it)
    n = 40
    want = p.predict({"dense": b["dense"][:n],
                      "cat": {k: v[:n] for k, v in b["cat"].items()}})
    resp = _call(ch, "ModelInfer", _infer_request(model, b, n, raw),
                 pb.ModelInferResponse)
    assert resp.outputs[0].name == "scores"
    assert list(resp.outputs[0].shape) == [n]
    got = np.asarray(resp.outputs[0].contents.fp32_contents, np.float32)
    np.testing.assert_array_equal(got, np.asarray(want, np.float32))


def test_unknown_model_aborts(served):
    model, p, srv, ch, it = served
    req = pb.ModelInferRequest(model_name="missing")
    with pytest.raises(grpc.RpcError) as e:
        _call(ch, "ModelInfer", req, pb.ModelInferResponse)
    assert e.value.code() == grpc.StatusCode.NOT_FOUND
