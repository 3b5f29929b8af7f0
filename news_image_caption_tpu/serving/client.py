"""Client: PUSH jobs to the server, SUBscribe for results.

Capability parity target: TellClient / CaptioningClient
(/root/reference/ttl/tell/client/base.py, client/caption.py:7-18):
UUID identity, job ids, timeout, result parsing.
"""

from __future__ import annotations

import uuid
from typing import Any, Dict

import numpy as np
import zmq

from news_image_caption_tpu.serving.messages import pack, unpack


class CaptioningClient:
    def __init__(self, frontend_addr: str, sink_pub_addr: str,
                 timeout_ms: int = 30000):
        self.identity = uuid.uuid4().hex.encode()
        self.timeout_ms = timeout_ms
        self._ctx = zmq.Context()
        self._push = self._ctx.socket(zmq.PUSH)
        self._push.connect(frontend_addr)
        self._sub = self._ctx.socket(zmq.SUB)
        self._sub.connect(sink_pub_addr)
        self._sub.setsockopt(zmq.SUBSCRIBE, self.identity)
        self._job_counter = 0

    def caption(self, job: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Send one job, block for its result (or raise TimeoutError)."""
        self._job_counter += 1
        job_id = str(self._job_counter).encode()
        self._push.send_multipart(
            [self.identity, job_id] + pack(job))
        poller = zmq.Poller()
        poller.register(self._sub, zmq.POLLIN)
        waited = 0
        step = 100
        while waited < self.timeout_ms:
            events = dict(poller.poll(timeout=step))
            if self._sub in events:
                frames = self._sub.recv_multipart()
                if frames[0] == self.identity and frames[1] == job_id:
                    result = unpack(frames[2:])
                    if "error" in result:
                        raise RuntimeError(result["error"])
                    return result
            waited += step
        raise TimeoutError(
            f"no result for job {job_id!r} within {self.timeout_ms}ms")

    def close(self):
        self._push.close()
        self._sub.close()
        self._ctx.term()
