"""Example: drive a SO-101 arm from a deployed action server
(reference: playground/so101_inference_example.py + hardware/docs/
so101_inference_example.md).

Start a policy server first (any exp's `--task inference`), then run the
gRPC bridge that adapts LeRobot's async-inference protocol:

    python <your_exp>.py --task inference          # action server :7891
    python -m hardware.so101.bridge_server \
        --server_url http://localhost:7891/process_frame

This script shows the raw DexClient loop the bridge wraps.
"""

import numpy as np

from dexbotic_tpu.client import DexClient


def main():
    client = DexClient(
        url="http://localhost:7891/process_frame",
        execute_steps=8,  # re-query after this many actions
    )
    instruction = "pick up the red block"
    for step in range(100):
        frame = np.zeros((480, 640, 3), np.uint8)  # replace with camera read
        action = client.act(frame, instruction)
        print(f"step {step}: action {np.round(np.asarray(action), 3).tolist()}")
        # send `action` to the robot controller here


if __name__ == "__main__":
    main()
