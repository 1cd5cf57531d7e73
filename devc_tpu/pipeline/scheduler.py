"""Multi-clip batched inference scheduler (production serving shape).

The reference serves one clip at a time (test.py). On TPU the natural
serving shape is clip-level batching: B clip slots advance one frame per
device step through parallel/inference.py::batched_frame_step (ONE
compiled program for the whole service lifetime), with finished slots
refilled from a job queue. Per-step fixed costs (dispatch, small-tensor
stages) amortize across slots, and on a multi-chip mesh the slot axis
shards over "data" (BASELINE.json config 5).

Host side: one decode thread per active slot feeds frames ahead; a writer
pool overlaps JPEG/PNG encode with device compute. Slots whose clip has
ended keep stepping on a zero frame (static shapes, no recompiles) until
a new job replaces their exemplar row and resets their carry row.

Used by cli/serve.py's {"cmd": "batch", "jobs": [...]} request.
"""

from __future__ import annotations

import os
import queue
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from devc_tpu.data.transforms import load_frame_rgb
from devc_tpu.parallel.inference import batched_frame_step
from devc_tpu.pipeline.video import _device_ref_features, list_clip_frames


class _Slot:
    __slots__ = ("job", "frames_q", "reader", "index", "written", "t0")

    def __init__(self):
        self.job = None
        self.frames_q = None
        self.reader = None
        self.index = 0
        self.written = []
        self.t0 = 0.0


class ClipBatchScheduler:
    """Run many (clip, exemplar, output_dir) jobs through one B-slot
    batched device program.

    Results (per job dict: frames, seconds, fps, outputs) are returned by
    run() in submission order.
    """

    def __init__(
        self,
        params,
        image_size=(432, 768),
        slots: int = 4,
        temperature: float = 1e-10,
        wls: bool = True,
        use_pallas: bool | None = None,
        prefetch: int = 4,
        out_ext: str = "jpg",
    ):
        self.params = params
        self.image_size = tuple(image_size)
        self.slots = slots
        self.temperature = temperature
        self.wls = wls
        self.use_pallas = use_pallas
        self.prefetch = prefetch
        self.out_ext = out_ext
        self.jobs = []

    def submit(self, clip_path: str, ref_path: str, output_path: str):
        self.jobs.append(dict(clip_path=clip_path, ref_path=ref_path,
                              output_path=output_path))
        return len(self.jobs) - 1

    # -- internals ---------------------------------------------------------

    def _start_slot(self, slot: _Slot, job_idx: int):
        job = dict(self.jobs[job_idx], idx=job_idx)
        names = list_clip_frames(job["clip_path"])
        if not names:
            raise ValueError(f"no frames in {job['clip_path']}")
        os.makedirs(job["output_path"], exist_ok=True)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        size = self.image_size

        def reader():
            for n in names:
                q.put(load_frame_rgb(os.path.join(job["clip_path"], n), size))
            q.put(None)

        t = threading.Thread(target=reader, daemon=True)
        t.start()
        slot.job = job
        slot.frames_q = q
        slot.reader = t
        slot.index = 0
        slot.written = []
        slot.t0 = time.time()

    def run(self):
        h, w = self.image_size
        b = self.slots
        zero_frame = np.zeros((h, w, 3), np.uint8)

        results = [None] * len(self.jobs)
        pending = list(range(len(self.jobs)))
        slots = [_Slot() for _ in range(b)]

        # batched exemplar state: rows updated in place as jobs rotate in
        ref_stack = None  # pytree with leading dim b
        last = jnp.zeros((b, h // 2, w // 2, 3), jnp.float32)

        def set_ref_row(i, ref_path):
            nonlocal ref_stack
            ref_u8 = jnp.asarray(load_frame_rgb(ref_path, self.image_size))
            _, state = _device_ref_features(self.params, ref_u8)  # B=1 rows
            if ref_stack is None:
                ref_stack = jax.tree.map(
                    lambda x: jnp.concatenate([x] * b, axis=0), state
                )
            else:
                ref_stack = jax.tree.map(
                    lambda full, new: full.at[i].set(new[0]), ref_stack, state
                )

        def refill(i):
            nonlocal last
            while pending:
                job_idx = pending.pop(0)
                try:
                    self._start_slot(slots[i], job_idx)
                    set_ref_row(i, slots[i].job["ref_path"])
                except Exception as e:  # bad clip/exemplar: fail the job only
                    results[job_idx] = dict(error=str(e))
                    slots[i].job = None
                    continue
                last = last.at[i].set(0.0)
                return
            slots[i].job = None

        for i in range(b):
            refill(i)
        if ref_stack is None:
            return results  # no jobs

        # writer pool
        write_q: "queue.Queue" = queue.Queue(maxsize=2 * b)

        def writer():
            while True:
                item = write_q.get()
                if item is None:
                    return
                path, arr = item
                Image.fromarray(arr).save(path, quality=95)

        wt = threading.Thread(target=writer, daemon=True)
        wt.start()

        step = jax.jit(
            lambda p, f, l, rs: batched_frame_step(
                p, f, l, rs,
                temperature=self.temperature, wls=self.wls,
                use_pallas=self.use_pallas,
            )
        )

        while any(s.job is not None for s in slots):
            frames = []
            active = []
            for i, s in enumerate(slots):
                if s.job is None:
                    frames.append(zero_frame)
                    continue
                frame = s.frames_q.get()
                if frame is None:  # clip finished
                    dt = time.time() - s.t0
                    results[s.job["idx"]] = dict(
                        frames=s.index,
                        seconds=round(dt, 2),
                        fps=round(s.index / dt, 2) if dt > 0 else 0.0,
                        outputs=sorted(s.written),
                    )
                    refill(i)
                    s = slots[i]
                    if s.job is None:
                        frames.append(zero_frame)
                        continue
                    frame = s.frames_q.get()
                    if frame is None:  # empty clip cannot happen (_start_slot)
                        frames.append(zero_frame)
                        continue
                frames.append(frame)
                active.append(i)
            if not active:
                break

            out, last = step(
                self.params, jnp.asarray(np.stack(frames)), last, ref_stack
            )
            out_np = np.asarray(out)
            for i in active:
                s = slots[i]
                path = os.path.join(
                    s.job["output_path"], f"{s.index:05d}.{self.out_ext}"
                )
                write_q.put((path, out_np[i]))
                s.written.append(path)
                s.index += 1

        write_q.put(None)
        wt.join()
        return results
