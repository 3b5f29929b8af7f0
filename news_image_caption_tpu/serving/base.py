"""ZMQ ventilator / sink serving architecture.

Capability parity target: NLPServer + Sink
(/root/reference/ttl/tell/server/base.py:30-382): a PULL frontend
receives client jobs, PUSH backends fan them out to worker processes,
a Sink process PUBlishes results back to subscribed clients; ServerCmd
control protocol; graceful shutdown.

Host-side architecture is unchanged on TPU (ZMQ is portable C); the
worker's compute becomes a jitted JAX generate function (worker.py).
"""

from __future__ import annotations

import multiprocessing
import shutil
import tempfile
import threading
from typing import Callable, List, Optional

import zmq

from news_image_caption_tpu.utils.logging import setup_logger


class ServerCmd:
    terminate = b"TERMINATE"
    show_config = b"SHOW_CONFIG"
    new_job = b"REGISTER"


def auto_bind(socket: zmq.Socket, created_dirs: Optional[list] = None
              ) -> str:
    """Bind to a random IPC path (parity: server/utils.py auto_bind).

    created_dirs: pass a list to record the tmpdir for cleanup —
    otherwise every bind leaks one /tmp/tellax-ipc-* directory."""
    tmp_dir = tempfile.mkdtemp(prefix="tellax-ipc-")
    if created_dirs is not None:
        created_dirs.append(tmp_dir)
    addr = f"ipc://{tmp_dir}/socket"
    socket.bind(addr)
    return addr


# JAX/CUDA state does not survive fork; use spawn like the
# reference (server/base.py:23-27).
_MP = multiprocessing.get_context("spawn")


class Sink(_MP.Process):
    """Collects worker results and PUBlishes them to clients."""

    def __init__(self, receive_addr_queue):
        super().__init__()
        self._addr_queue = receive_addr_queue
        self.daemon = True

    def run(self):
        ctx = zmq.Context()
        dirs: List[str] = []
        receiver = ctx.socket(zmq.PULL)
        recv_addr = auto_bind(receiver, dirs)
        publisher = ctx.socket(zmq.PUB)
        pub_addr = auto_bind(publisher, dirs)
        self._addr_queue.put((recv_addr, pub_addr))
        logger = setup_logger("sink")
        try:
            while True:
                frames = receiver.recv_multipart()
                if frames[0] == ServerCmd.terminate:
                    break
                # frames: [client_id, *payload]
                publisher.send_multipart(frames)
        finally:
            receiver.close()
            publisher.close()
            ctx.term()
            # The sink owns its IPC tmpdirs (the parent never sees
            # them); clean exit removes them — previously every
            # server lifecycle leaked two /tmp/tellax-ipc-* dirs.
            for d in dirs:
                shutil.rmtree(d, ignore_errors=True)


class CaptionServer:
    """Ventilator: client PULL frontend -> worker PUSH backends."""

    def __init__(self, worker_factory: Callable, num_workers: int = 1,
                 monitor_workers: bool = True):
        """monitor_workers: a liveness thread respawns any worker
        process that dies (segfault, OOM-kill, device loss), keeping
        serving capacity up. Jobs already queued to the dead worker's
        PUSH pipe are lost (clients see a timeout and retry) — the
        respawn restores capacity, it does not replay. The reference
        has no analogue (a dead task process silently drains jobs,
        server/base.py)."""
        self.worker_factory = worker_factory
        self.num_workers = num_workers
        self.monitor_workers = monitor_workers
        # PER-WORKER crash-loop bound: a deterministically-failing
        # worker (bad checkpoint, device already held) must not
        # respawn forever; the budget resets after 60s of survival.
        self.max_respawns = 20
        self.logger = setup_logger("server")
        self._procs: List[multiprocessing.Process] = []
        self._workers: List[multiprocessing.Process] = []
        # Created in __init__ so stop() is safe before/without start().
        self._stop = threading.Event()
        self._stopped = False
        self._ipc_dirs: List[str] = []
        self.respawn_count = 0
        self.frontend_addr: Optional[str] = None
        self.sink_pub_addr: Optional[str] = None
        self._thread: Optional[threading.Thread] = None
        self._monitor: Optional[threading.Thread] = None
        self._ctx: Optional[zmq.Context] = None

    def start(self):
        ctx = zmq.Context()
        self._ctx = ctx
        frontend = ctx.socket(zmq.PULL)
        self.frontend_addr = auto_bind(frontend, self._ipc_dirs)

        addr_q = _MP.Queue()
        sink = Sink(addr_q)
        sink.start()
        # Bounded get + liveness check: a Sink that dies during
        # startup (bind failure, full /tmp, spawn import error) must
        # raise instead of hanging the caller forever.
        import queue as _queue
        while True:
            try:
                sink_recv_addr, self.sink_pub_addr = addr_q.get(
                    timeout=1.0)
                break
            except _queue.Empty:
                if not sink.is_alive():
                    raise RuntimeError(
                        f"sink process died during startup "
                        f"(exitcode {sink.exitcode})")
        self._procs.append(sink)
        self._sink_recv_addr = sink_recv_addr

        backend = ctx.socket(zmq.PUSH)
        # Bounded send so the relay can observe _stop even when every
        # worker is wedged and the PUSH high-water mark is full.
        backend.setsockopt(zmq.SNDTIMEO, 200)
        backend_addr = auto_bind(backend, self._ipc_dirs)

        self._backend_addr = backend_addr
        for i in range(self.num_workers):
            w = self.worker_factory(worker_id=i,
                                    receive_addr=backend_addr,
                                    sink_addr=sink_recv_addr)
            w.start()
            self._workers.append(w)

        def relay():
            poller = zmq.Poller()
            poller.register(frontend, zmq.POLLIN)
            try:
                while True:
                    events = dict(poller.poll(timeout=200))
                    if frontend in events:
                        frames = frontend.recv_multipart()
                        if frames[0] == ServerCmd.terminate:
                            # Full shutdown like the reference's
                            # control path — not just this thread (a
                            # half-dead server would keep respawning
                            # workers).
                            self._stop.set()
                            threading.Thread(target=self.stop,
                                             daemon=True).start()
                            break
                        while not self._stop.is_set():
                            try:
                                backend.send_multipart(frames)
                                break
                            except zmq.Again:  # workers wedged:
                                continue       # retry, stay stoppable
                    if self._stop.is_set():
                        break
            finally:
                # Sockets MUST close on any exit (ETERM, EINTR, bugs):
                # stop()'s ctx.term() blocks until every socket in the
                # context is closed — an escaped exception here would
                # otherwise hang shutdown forever.
                frontend.close(linger=0)
                backend.close(linger=0)

        self._thread = threading.Thread(target=relay, daemon=True)
        self._thread.start()

        def monitor():
            import time as _time
            # PER-WORKER respawn budgets: one crash-looping worker
            # must not burn the budget shared by healthy workers, and
            # a worker that survives 60s after a respawn earns its
            # budget back (occasional transient deaths over a long
            # deployment never exhaust anything). A worker whose
            # budget is spent is given up on individually; the
            # monitor keeps serving the others.
            delay = 1.0
            counts = [0] * len(self._workers)
            last = [0.0] * len(self._workers)
            given_up = set()
            while not self._stop.wait(delay):
                for i, w in enumerate(self._workers):
                    if (w.is_alive() or self._stop.is_set()
                            or i in given_up):
                        continue
                    now = _time.monotonic()
                    if counts[i] and now - last[i] >= 60.0:
                        counts[i] = 0   # survived long enough: reset
                    if counts[i] >= self.max_respawns:
                        self.logger.error(
                            "worker %d died but its respawn budget "
                            "(%d) is spent — a deterministic "
                            "failure? Giving up on this worker.",
                            i, self.max_respawns)
                        given_up.add(i)
                        continue
                    self.logger.warning(
                        "worker %d died (exitcode %s); respawning",
                        i, w.exitcode)
                    nw = self.worker_factory(
                        worker_id=i,
                        receive_addr=self._backend_addr,
                        sink_addr=self._sink_recv_addr)
                    nw.start()
                    self._workers[i] = nw
                    counts[i] += 1
                    self.respawn_count += 1
                    # Exponential backoff when deaths come fast
                    # (crash loop), reset once a worker survives.
                    delay = (min(delay * 2, 30.0)
                             if now - last[i] < 10.0 else 1.0)
                    last[i] = now

        if self.monitor_workers:
            self._monitor = threading.Thread(target=monitor,
                                             daemon=True)
            self._monitor.start()
        self.logger.info("server up: frontend=%s workers=%d",
                         self.frontend_addr, self.num_workers)
        return self

    def stop(self):
        if self._stopped:
            return
        self._stopped = True
        self._stop.set()
        me = threading.current_thread()
        if self._thread is not None and self._thread is not me:
            self._thread.join(timeout=2)
        if self._monitor is not None and self._monitor is not me:
            # Generous join: a mid-respawn spawn can take seconds;
            # snapshotting workers BEFORE the monitor finishes would
            # leak the freshly respawned process.
            self._monitor.join(timeout=15)
        # tell the sink to stop
        if getattr(self, "_sink_recv_addr", None):
            try:
                ctx = zmq.Context()
                s = ctx.socket(zmq.PUSH)
                s.connect(self._sink_recv_addr)
                s.send_multipart([ServerCmd.terminate])
                s.close(linger=0)
                ctx.term()
            except Exception:
                pass
        for p in self._procs + self._workers:
            p.terminate()
            p.join(timeout=2)
        if self._ctx is not None:
            self._ctx.term()
        for d in self._ipc_dirs:
            shutil.rmtree(d, ignore_errors=True)
        self._ipc_dirs.clear()
