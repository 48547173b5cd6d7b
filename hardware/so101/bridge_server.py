"""SO-101 gRPC bridge: LeRobot async-inference protocol -> action server.

Equivalent surface to /root/reference/hardware/so101/bridge_server.py:10-157:
a gRPC AsyncInference servicer receives observation streams from a LeRobot
robot client, forwards frames to the dexbotic_tpu HTTP action server through
DexClient, and streams TimedAction chunks back.

Requires LeRobot's generated `async_inference_pb2*` modules on PYTHONPATH
(gated import — this file is the adapter logic; proto stubs ship with
LeRobot).
"""

from __future__ import annotations

import argparse
import pickle
import queue
import threading
import time

import numpy as np

from dexbotic_tpu.client import DexClient

try:
    import grpc

    from lerobot.transport import (  # type: ignore
        async_inference_pb2,
        async_inference_pb2_grpc,
    )

    _HAVE_GRPC = True
except ImportError:  # pragma: no cover
    _HAVE_GRPC = False


class BridgeState:
    def __init__(self, client: DexClient, instruction: str, camera_key: str, state_key: str):
        self.client = client
        self.instruction = instruction
        self.camera_key = camera_key
        self.state_key = state_key
        self.obs_queue: queue.Queue = queue.Queue(maxsize=2)
        self.action_queue: queue.Queue = queue.Queue()
        self.running = True

    def worker(self):
        """obs queue -> DexClient -> timed actions."""
        while self.running:
            try:
                timestep, obs = self.obs_queue.get(timeout=1.0)
            except queue.Empty:
                continue
            image = obs.get(self.camera_key)
            state = obs.get(self.state_key)
            action = self.client.act(image, self.instruction, state=state)
            self.action_queue.put((timestep, np.asarray(action)))


if _HAVE_GRPC:

    class AsyncInferenceServicer(async_inference_pb2_grpc.AsyncInferenceServicer):
        def __init__(self, state: BridgeState):
            self.state = state

        def Ready(self, request, context):
            return async_inference_pb2.Empty()

        def SendObservations(self, request_iterator, context):
            for obs_msg in request_iterator:
                obs = pickle.loads(obs_msg.data)
                ts = obs.get("timestep", time.monotonic())
                try:
                    self.state.obs_queue.put_nowait((ts, obs))
                except queue.Full:
                    pass  # drop stale frames
            return async_inference_pb2.Empty()

        def StreamActions(self, request, context):
            while self.state.running:
                try:
                    ts, action = self.state.action_queue.get(timeout=1.0)
                except queue.Empty:
                    continue
                msg = async_inference_pb2.TimedAction(
                    timestep=int(ts), data=pickle.dumps(action)
                )
                yield msg

        def SendPolicyInstructions(self, request, context):
            spec = pickle.loads(request.data)
            self.state.instruction = spec.get("task", self.state.instruction)
            return async_inference_pb2.Empty()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--server_url", default="http://localhost:7891/process_frame")
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--instruction", default="")
    ap.add_argument("--camera_key", default="observation.images.front")
    ap.add_argument("--state_key", default="observation.state")
    ap.add_argument("--execute_steps", type=int, default=8)
    args = ap.parse_args()

    if not _HAVE_GRPC:
        raise SystemExit("grpc + lerobot transport stubs required for the SO-101 bridge")

    state = BridgeState(
        DexClient(url=args.server_url, execute_steps=args.execute_steps),
        args.instruction, args.camera_key, args.state_key,
    )
    threading.Thread(target=state.worker, daemon=True).start()

    server = grpc.server(
        __import__("concurrent.futures", fromlist=["ThreadPoolExecutor"]).ThreadPoolExecutor(8)
    )
    async_inference_pb2_grpc.add_AsyncInferenceServicer_to_server(
        AsyncInferenceServicer(state), server
    )
    server.add_insecure_port(f"[::]:{args.port}")
    server.start()
    print(f"SO-101 bridge listening on :{args.port} -> {args.server_url}")
    server.wait_for_termination()


if __name__ == "__main__":
    main()
