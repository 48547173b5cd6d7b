"""Robot-side HTTP client with an action-chunk queue.

Protocol- and behavior-compatible with the reference DexClient
(/root/reference/dexbotic/client.py:9-77): POST frames to /process_frame,
queue the returned chunk, pop one action per act() call, re-query when the
queue runs dry; optional delta->absolute integration with +/-pi wrapping.
"""

from __future__ import annotations

import io
from collections import deque

import numpy as np
import requests


class DexClient:
    def __init__(
        self,
        url: str = "http://localhost:7891/process_frame",
        execute_steps: int = 8,
        delta_action: bool = False,
        angle_indices: tuple = (3, 4, 5),
    ):
        self.url = url
        self.execute_steps = execute_steps
        self.delta_action = delta_action
        self.angle_indices = list(angle_indices)
        self.queue: deque = deque()

    def reset(self):
        self.queue.clear()

    def _post(self, image, instruction: str, state=None):
        if isinstance(image, np.ndarray):
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(image).save(buf, format="PNG")
            payload = buf.getvalue()
        else:
            payload = image
        files = {"image": ("frame.png", payload, "image/png")}
        data = {"text": instruction}
        if state is not None:
            data["states"] = ",".join(str(float(x)) for x in np.asarray(state).ravel())
        resp = requests.post(self.url, data=data, files=files, timeout=60)
        resp.raise_for_status()
        return np.asarray(resp.json(), dtype=np.float64)

    def act(self, image, instruction: str, state=None) -> np.ndarray:
        """Return the next action; refills the queue from the server when empty."""
        if not self.queue:
            chunk = self._post(image, instruction, state)
            for a in chunk[: self.execute_steps]:
                self.queue.append(np.asarray(a))
        action = self.queue.popleft()
        if self.delta_action and state is not None:
            action = self._integrate(action, np.asarray(state, np.float64))
        return action

    def _integrate(self, delta: np.ndarray, state: np.ndarray) -> np.ndarray:
        out = delta.copy()
        d = min(len(delta), len(state))
        out[:d] = state[:d] + delta[:d]
        for i in self.angle_indices:
            if i < len(out):
                while out[i] > np.pi:
                    out[i] -= 2 * np.pi
                while out[i] < -np.pi:
                    out[i] += 2 * np.pi
        return out
