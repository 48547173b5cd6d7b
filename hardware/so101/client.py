"""SO-101 robot-side client: action-chunk queue with chained delta
integration.

Behavioral equivalent of the reference SO-101 client
(/root/reference/hardware/so101/client.py): posts the camera frame(s) to
/process_frame, integrates each returned DELTA action on top of the
previously queued absolute action (gripper dims zeroed before integration,
roll/pitch/yaw wrapped to [-pi, pi]), and queues every action TWICE — the
SO-101 control loop runs at 2x the policy's action rate, so each action is
held for two control ticks (reference :50-52; deliberate there, kept here).

Usage:
    from hardware.so101.client import SO101Client
    client = SO101Client("http://<server>:7891")
    action = client.act({"image": frame_rgb}, "pick up the cube")
"""

from __future__ import annotations

import io
from collections import deque

import numpy as np


class SO101Client:
    def __init__(self, base_url: str, use_delta: bool = True,
                 hold_ticks: int = 2):
        self.base_url = base_url.rstrip("/")
        self.use_delta = use_delta
        self.hold_ticks = hold_ticks
        self.action_queue: deque = deque()
        self.set_init_action()

    def set_init_action(self, action=(0, 0, 0, 0, 0, 0, 0)):
        self.last_act = np.asarray(action, np.float64)

    def act(self, observation: dict, prompt: str) -> np.ndarray:
        if not self.action_queue:
            self._acquire(observation, prompt)
        action = self.action_queue.popleft()
        self.last_act = action
        return action

    def _encode(self, image: np.ndarray) -> bytes:
        try:
            import cv2

            ok, buf = cv2.imencode(".png", image[:, :, ::-1])  # RGB->BGR
            if ok:
                return buf.tobytes()
        except ImportError:
            pass
        from PIL import Image

        b = io.BytesIO()
        Image.fromarray(image).save(b, format="PNG")
        return b.getvalue()

    def _acquire(self, observation: dict, prompt: str) -> None:
        import requests

        img = observation["image"]
        images = img if isinstance(img, list) else [img]
        resp = requests.post(
            f"{self.base_url}/process_frame",
            data={"text": prompt},
            files=[("image", self._encode(im)) for im in images],
            timeout=60,
        )
        resp.raise_for_status()
        body = resp.json()
        chunk = body.get("response", body)  # our server returns the chunk raw

        last = self.last_act
        for delta in np.asarray(chunk, np.float64):
            action = self._integrate(last, delta) if self.use_delta else delta.copy()
            for _ in range(self.hold_ticks):
                self.action_queue.append(action)
            last = action

    @staticmethod
    def _integrate(last_action: np.ndarray, delta: np.ndarray) -> np.ndarray:
        base = np.asarray(last_action, np.float64).copy()
        if len(base) > 6:
            base[6:] = 0.0  # gripper command is absolute, not integrated
        action = base[: len(delta)] + delta
        if len(action) >= 6:
            a = action[3:6]
            action[3:6] = np.where(a > np.pi, a - 2 * np.pi, a)
            a = action[3:6]
            action[3:6] = np.where(a < -np.pi, a + 2 * np.pi, a)
        return action


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://localhost:7891")
    ap.add_argument("--prompt", default="pick up the cube")
    args = ap.parse_args()
    rs = np.random.RandomState(0)
    client = SO101Client(args.url)
    frame = rs.randint(0, 255, (480, 640, 3), np.uint8)
    print(client.act({"image": frame}, args.prompt))
