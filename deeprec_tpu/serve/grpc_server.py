"""KServe v2 (Open Inference Protocol) gRPC serving frame.

The reference's processor plugs into TF-Serving / Triton gRPC frontends
(serving/processor/serving/model_serving.h, tf_predict.proto); here the
same Processor serves the open v2 protocol over real gRPC — wire-level
compatible with stock clients (tritonclient.grpc, kserve) because the
message field numbers in protos/grpc_predict_v2.proto follow the
published spec.  The HTTP twin (serve/http_server.py) shares the
metadata/decode helpers, so both surfaces score identically.

Service stubs are hand-wired through ``grpc.method_handlers_generic_
handler`` (message classes come from protoc's --python_out; the grpc
python plugin is not in this image — generic handlers are the stable
public API for exactly this situation).
"""

from __future__ import annotations

from concurrent import futures
from typing import Optional

import numpy as np

from deeprec_tpu.serve import http_server as _http
from deeprec_tpu.serve.protos import grpc_predict_v2_pb2 as pb

_SERVICE = "inference.GRPCInferenceService"

_NP_BY_DT = {"FP32": np.float32, "FP64": np.float64,
             "INT32": np.int32, "INT64": np.int64,
             "UINT32": np.uint32, "UINT64": np.uint64, "BOOL": np.bool_}
_CONTENTS_FIELD = {"FP32": "fp32_contents", "FP64": "fp64_contents",
                   "INT32": "int_contents", "INT64": "int64_contents",
                   "UINT32": "uint_contents", "UINT64": "uint64_contents",
                   "BOOL": "bool_contents"}


def _decode_input(tensor, raw: Optional[bytes]):
    dt = _NP_BY_DT.get(tensor.datatype)
    if dt is None:
        raise ValueError(f"unsupported datatype {tensor.datatype!r}")
    shape = tuple(int(s) for s in tensor.shape)
    if raw is not None and len(raw):
        # raw_input_contents: packed little-endian (tritonclient's default)
        arr = np.frombuffer(raw, dtype=np.dtype(dt).newbyteorder("<"))
    else:
        arr = np.asarray(
            getattr(tensor.contents, _CONTENTS_FIELD[tensor.datatype]), dt)
    return arr.reshape(shape)


class GrpcInferenceServer:
    """serve(processor_or_manager) over gRPC; ``.start()`` returns at once."""

    def __init__(self, target, port: int = 0, host: str = "127.0.0.1",
                 max_workers: int = 8):
        import grpc

        from deeprec_tpu.serve.multi import ModelManager

        self._manager = target if isinstance(target, ModelManager) else None
        self._processor = None if self._manager is not None else target

        def model(name):
            if self._manager is not None:
                return self._manager.get(name)
            if (self._processor is not None
                    and name in ("", self._processor.model.name)):
                return self._processor
            raise KeyError(f"unknown model {name!r}")

        def server_live(req, ctx):
            return pb.ServerLiveResponse(live=True)

        def server_ready(req, ctx):
            return pb.ServerReadyResponse(ready=True)

        def model_ready(req, ctx):
            try:
                model(req.name)
                return pb.ModelReadyResponse(ready=True)
            except KeyError:
                return pb.ModelReadyResponse(ready=False)

        def model_metadata(req, ctx):
            try:
                proc = model(req.name)
            except KeyError as e:
                ctx.abort(grpc.StatusCode.NOT_FOUND, str(e))
            meta = _http._v2_metadata(proc)
            resp = pb.ModelMetadataResponse(
                name=meta["name"], versions=meta["versions"],
                platform=meta["platform"])
            for sec, out in (("inputs", resp.inputs),
                             ("outputs", resp.outputs)):
                for t in meta[sec]:
                    m = out.add()
                    m.name, m.datatype = t["name"], t["datatype"]
                    m.shape.extend(t["shape"])
            return resp

        def model_infer(req, ctx):
            try:
                proc = model(req.model_name)
            except KeyError as e:
                ctx.abort(grpc.StatusCode.NOT_FOUND, str(e))
            dense, cat = None, {}
            for i, t in enumerate(req.inputs):
                raw = (req.raw_input_contents[i]
                       if i < len(req.raw_input_contents) else None)
                arr = _decode_input(t, raw)
                if t.name == "dense":
                    dense = arr.astype(np.float32)
                else:
                    cat[t.name] = _http.cast_cat(arr)
            if dense is None:
                ctx.abort(grpc.StatusCode.INVALID_ARGUMENT,
                          "missing input tensor 'dense'")
            scores = proc.predict({"dense": dense, "cat": cat})
            resp = pb.ModelInferResponse(
                model_name=req.model_name, id=req.id,
                model_version=str(proc.get_serving_model_info()["version"]))
            out = resp.outputs.add()
            out.name, out.datatype = "scores", "FP32"
            out.shape.extend([len(scores)])
            out.contents.fp32_contents.extend(
                np.asarray(scores, np.float32).tolist())
            return resp

        def unary(fn, req_cls):
            return grpc.unary_unary_rpc_method_handler(
                fn, request_deserializer=req_cls.FromString,
                response_serializer=lambda m: m.SerializeToString())

        handler = grpc.method_handlers_generic_handler(_SERVICE, {
            "ServerLive": unary(server_live, pb.ServerLiveRequest),
            "ServerReady": unary(server_ready, pb.ServerReadyRequest),
            "ModelReady": unary(model_ready, pb.ModelReadyRequest),
            "ModelMetadata": unary(model_metadata, pb.ModelMetadataRequest),
            "ModelInfer": unary(model_infer, pb.ModelInferRequest),
        })
        self._server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=max_workers))
        self._server.add_generic_rpc_handlers((handler,))
        self.port = self._server.add_insecure_port(f"{host}:{port}")

    def start(self) -> "GrpcInferenceServer":
        self._server.start()
        return self

    def stop(self):
        self._server.stop(grace=None)
