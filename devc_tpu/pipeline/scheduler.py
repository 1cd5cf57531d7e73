"""Multi-clip batched inference scheduler (production serving shape).

The reference serves one clip at a time (test.py). On TPU the natural
serving shape is clip-level batching: B clip slots advance one frame per
device step through parallel/inference.py::batched_frame_step (ONE
compiled program for the whole service lifetime), with finished slots
refilled from a job queue. Per-step fixed costs (dispatch, small-tensor
stages) amortize across slots, and on a multi-chip mesh the slot axis
shards over "data" (BASELINE.json config 5).

Jobs may be frame folders OR video files (cv2 stream decode), mixed
freely in one batch. With device_resize=True the host only decodes: each
slot's raw frames are zero-padded to the batch's max source size and the
anti-aliased CenterPad runs on device through per-slot sampling-matrix
plans (ops/device_resize.py::centerpad_plan_padded), so mixed-resolution
jobs still share the single compiled program.

Host side: one decode thread per active slot feeds frames ahead; a writer
thread overlaps JPEG/PNG encode with device compute. Failures are
isolated per job: a bad clip/exemplar, a mid-clip decode error, or a
write failure (disk full) fails THAT job's result and frees its slot;
the batch keeps running. Slots whose clip has ended keep stepping on a
zero frame (static shapes, no recompiles) until a new job replaces their
exemplar row and resets their carry row.

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

from devc_tpu.data.transforms import list_clip_frames, load_frame_rgb
from devc_tpu.parallel.inference import batched_frame_step
from devc_tpu.pipeline.video import _device_ref_features, is_video_file


class _Slot:
    __slots__ = ("job", "frames_q", "reader", "index", "written", "t0")

    def __init__(self):
        self.job = None
        self.frames_q = None
        self.reader = None
        self.index = 0
        self.written = []
        self.t0 = 0.0


def _probe_source(clip_path: str):
    """(kind, names_or_None, (src_h, src_w)) without decoding the clip.

    kind: "video" | "frames". Raises on empty/unreadable sources so the
    scheduler can fail just that job.
    """
    if is_video_file(clip_path):
        import cv2

        cap = cv2.VideoCapture(clip_path)
        if not cap.isOpened():
            raise ValueError(f"cannot open video file {clip_path}")
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        cap.release()
        if h <= 0 or w <= 0:
            raise ValueError(f"no frames decoded from {clip_path}")
        return "video", None, (h, w)
    names = list_clip_frames(clip_path)
    if not names:
        raise ValueError(f"no frames in {clip_path}")
    with Image.open(os.path.join(clip_path, names[0])) as im:
        w, h = im.size  # PIL header read, no full decode
    return "frames", names, (h, w)


class ClipBatchScheduler:
    """Run many (clip, exemplar, output_dir) jobs through one B-slot
    batched device program.

    Results (per job dict: frames, seconds, fps, outputs — or error) are
    returned by run() in submission order.
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
        device_resize: bool = False,
    ):
        self.params = params
        self.image_size = tuple(image_size)
        self.slots = slots
        self.temperature = temperature
        self.wls = wls
        self.use_pallas = use_pallas
        self.prefetch = prefetch
        self.out_ext = out_ext
        self.device_resize = device_resize
        self.jobs = []

    def submit(self, clip_path: str, ref_path: str, output_path: str):
        self.jobs.append(dict(clip_path=clip_path, ref_path=ref_path,
                              output_path=output_path))
        return len(self.jobs) - 1

    # -- internals ---------------------------------------------------------

    def _frame_iter(self, job):
        """Yield per-frame uint8 arrays for one job: host-CenterPadded to
        image_size, or raw zero-padded to the batch max (device_resize)."""
        kind, names, src_hw = job["kind"], job["names"], job["src_hw"]
        if kind == "video":
            from devc_tpu.pipeline.video import _video_frames_rgb

            raw_iter = _video_frames_rgb(job["clip_path"])
        else:
            if not self.device_resize:
                for n in names:  # decode + CenterPad in one helper
                    yield load_frame_rgb(
                        os.path.join(job["clip_path"], n), self.image_size
                    )
                return
            raw_iter = (
                np.asarray(
                    Image.open(
                        os.path.join(job["clip_path"], n)
                    ).convert("RGB")
                )
                for n in names
            )
        if not self.device_resize:
            from devc_tpu.data.transforms import centerpad_np

            for raw in raw_iter:
                yield centerpad_np(raw, self.image_size)
            return
        mh, mw = self._max_hw
        for raw in raw_iter:
            if raw.shape[:2] != tuple(src_hw):
                raise ValueError(
                    f"frame resolution changed mid-clip in "
                    f"{job['clip_path']}: {raw.shape[:2]} vs {src_hw} "
                    "(device_resize requires a uniform clip resolution)"
                )
            padded = np.zeros((mh, mw, 3), np.uint8)
            padded[: raw.shape[0], : raw.shape[1]] = raw
            yield padded

    def _start_slot(self, slot: _Slot, job_idx: int):
        job = dict(self.jobs[job_idx], idx=job_idx)
        job["kind"], job["names"], job["src_hw"] = _probe_source(
            job["clip_path"]
        )
        os.makedirs(job["output_path"], exist_ok=True)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        def reader():
            try:
                for frame in self._frame_iter(job):
                    q.put(frame)
                q.put(None)
            except Exception as e:  # mid-clip decode failure -> fail the job
                q.put(e)

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

        results = [None] * len(self.jobs)
        pending = list(range(len(self.jobs)))
        slots = [_Slot() for _ in range(b)]

        # device_resize: the batch's common raw frame size is the max over
        # every runnable job's source; per-slot plans live as [B, th, maxH]
        # / [B, tw, maxW] device inputs updated as jobs rotate in
        plans_h = plans_w = None
        if self.device_resize:
            src_sizes = []
            for idx in list(pending):
                try:
                    _, _, src_hw = _probe_source(self.jobs[idx]["clip_path"])
                    src_sizes.append(src_hw)
                except Exception as e:
                    results[idx] = dict(error=str(e))
                    pending.remove(idx)
            if not src_sizes:
                return results
            self._max_hw = (
                max(s[0] for s in src_sizes),
                max(s[1] for s in src_sizes),
            )
            mh, mw = self._max_hw
            plans_h = jnp.zeros((b, h, mh), jnp.float32)
            plans_w = jnp.zeros((b, w, mw), jnp.float32)
            in_h, in_w = mh, mw
        else:
            in_h, in_w = h, w
        zero_frame = np.zeros((in_h, in_w, 3), np.uint8)

        # batched exemplar state: rows updated in place as jobs rotate in
        ref_stack = None  # pytree with leading dim b
        last = jnp.zeros((b, h // 2, w // 2, 3), jnp.float32)

        def set_ref_row(i, ref_path):
            nonlocal ref_stack
            # exemplars are single frames: always host-CenterPadded
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

        def set_plan_row(i, src_hw):
            nonlocal plans_h, plans_w
            from devc_tpu.ops.device_resize import centerpad_plan_padded

            a_h, a_w = centerpad_plan_padded(
                src_hw, self.image_size, self._max_hw
            )
            plans_h = plans_h.at[i].set(jnp.asarray(a_h))
            plans_w = plans_w.at[i].set(jnp.asarray(a_w))

        def refill(i):
            nonlocal last
            while pending:
                job_idx = pending.pop(0)
                try:
                    self._start_slot(slots[i], job_idx)
                    set_ref_row(i, slots[i].job["ref_path"])
                    if self.device_resize:
                        set_plan_row(i, slots[i].job["src_hw"])
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
            return results  # no runnable jobs

        # writer thread with per-job failure isolation: an encode/IO error
        # records against its job and the batch keeps going
        write_q: "queue.Queue" = queue.Queue(maxsize=2 * b)
        writer_errs: dict[int, str] = {}

        def writer():
            while True:
                item = write_q.get()
                if item is None:
                    return
                job_idx, path, arr = item
                if job_idx in writer_errs:
                    continue  # job already failed; drop its queued frames
                try:
                    Image.fromarray(arr).save(path, quality=95)
                except Exception as e:
                    writer_errs[job_idx] = str(e)

        wt = threading.Thread(target=writer, daemon=True)
        wt.start()

        def finish_job(i, s):
            """Record a slot's result (success or writer failure), refill."""
            dt = time.time() - s.t0
            job_idx = s.job["idx"]
            if job_idx in writer_errs:
                results[job_idx] = dict(
                    error=f"write failed: {writer_errs[job_idx]}",
                    outputs=sorted(s.written),
                )
            else:
                results[job_idx] = dict(
                    frames=s.index,
                    seconds=round(dt, 2),
                    fps=round(s.index / dt, 2) if dt > 0 else 0.0,
                    outputs=sorted(s.written),
                )
            refill(i)

        # ph/pw are None on the host path — an empty pytree to jit, and the
        # trace-time `is not None` makes the plan branch static
        step = jax.jit(
            lambda p, f, l, rs, ph, pw: batched_frame_step(
                p, f, l, rs,
                temperature=self.temperature, wls=self.wls,
                use_pallas=self.use_pallas,
                resize_plans=(ph, pw) if ph is not None else None,
            )
        )

        while any(s.job is not None for s in slots):
            frames = []
            active = []
            for i, s in enumerate(slots):
                if s.job is None:
                    frames.append(zero_frame)
                    continue
                if s.job["idx"] in writer_errs:  # stop stepping failed jobs
                    finish_job(i, s)
                    s = slots[i]
                    if s.job is None:
                        frames.append(zero_frame)
                        continue
                frame = s.frames_q.get()
                if isinstance(frame, Exception):  # mid-clip decode failure
                    results[s.job["idx"]] = dict(
                        error=str(frame), outputs=sorted(s.written)
                    )
                    refill(i)
                    s = slots[i]
                    if s.job is None:
                        frames.append(zero_frame)
                        continue
                    frame = s.frames_q.get()
                    if isinstance(frame, Exception):
                        # two bad jobs in a row: fail and idle this step
                        results[s.job["idx"]] = dict(
                            error=str(frame), outputs=[]
                        )
                        refill(i)
                        frames.append(zero_frame)
                        continue
                if frame is None:  # clip finished
                    finish_job(i, s)
                    s = slots[i]
                    if s.job is None:
                        frames.append(zero_frame)
                        continue
                    frame = s.frames_q.get()
                    if frame is None or isinstance(frame, Exception):
                        # empty clip cannot happen (_probe_source); treat a
                        # first-frame decode error as a failed job
                        if isinstance(frame, Exception):
                            results[s.job["idx"]] = dict(
                                error=str(frame), outputs=[]
                            )
                            slots[i].job = None
                        frames.append(zero_frame)
                        continue
                frames.append(frame)
                active.append(i)
            if not active:
                continue_any = any(s.job is not None for s in slots)
                if not continue_any:
                    break
                continue

            out, last = step(
                self.params, jnp.asarray(np.stack(frames)), last, ref_stack,
                plans_h, plans_w,
            )
            # the batched step ran over ALL b rows; rows that idled this
            # iteration (zero_frame filler — e.g. a slot refilled after two
            # consecutive decode failures) must not keep the model's output
            # on a black frame as their recurrent carry, or the refilled
            # job's first real frame diverges from serial execution
            # (ADVICE r3). Re-zero those rows.
            if len(active) < b:
                keep = np.zeros((b, 1, 1, 1), np.float32)
                keep[active] = 1.0
                last = last * jnp.asarray(keep)
            out_np = np.asarray(out)
            for i in active:
                s = slots[i]
                path = os.path.join(
                    s.job["output_path"], f"{s.index:05d}.{self.out_ext}"
                )
                write_q.put((s.job["idx"], path, out_np[i]))
                s.written.append(path)
                s.index += 1

        write_q.put(None)
        wt.join()
        # writer errors that landed after the job's last frame
        for idx, msg in writer_errs.items():
            r = results[idx]
            if r is not None and "error" not in r:
                results[idx] = dict(
                    error=f"write failed: {msg}",
                    outputs=r.get("outputs", []),
                )
        return results
