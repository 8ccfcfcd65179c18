"""Threaded prefetching input pipeline.

Overlaps host-side batch assembly (HDF5 reads, ray-index sampling, numpy
gathers — all of which release the GIL) with device execution, so the TPU
never waits on the host between optimizer steps.  The reference's
DataLoader-based pipeline has no TPU analogue; this is the framework's
input-pipeline component (SURVEY.md §2b "per-host input pipeline").

Usage::

    pipe = PrefetchPipeline(dset, batch_size=4, ray_batch_size=512,
                            num_source_views=1, with_bbox=False, depth=2)
    for src_images, src_poses, focal, c, model_input, gt in pipe.epoch():
        state, metrics = train_step(state, ...)
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from avr_tpu.data.dataset import SceneClassDataset
from avr_tpu.data.sampling import gather_rays

__all__ = ["PrefetchPipeline"]

_DONE = object()


class PrefetchPipeline:
    def __init__(
        self,
        dset: SceneClassDataset,
        batch_size: int,
        ray_batch_size: int,
        num_source_views: int = 1,
        with_bbox: bool = False,
        depth: int = 2,
        seed: int = 0,
    ):
        self.dset = dset
        self.batch_size = batch_size
        self.ray_batch_size = ray_batch_size
        self.num_source_views = num_source_views
        self.with_bbox = with_bbox
        self.depth = depth
        self.rng = np.random.default_rng(seed)

    def _assemble(self, batch):
        from avr_tpu.training.loop import select_source_views

        src = select_source_views(self.rng, batch, self.num_source_views)
        model_input, gt = gather_rays(
            self.rng, batch, self.ray_batch_size, with_bbox=self.with_bbox
        )
        return (*src, model_input, gt)

    def epoch(self, shuffle: bool = True) -> Iterator[Tuple]:
        """Yield fully assembled train-step inputs for one epoch,
        prefetched ``depth`` batches ahead on a worker thread."""
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        err: list = []

        def worker():
            try:
                for batch in self.dset.batches(self.batch_size, shuffle=shuffle):
                    q.put(self._assemble(batch))
            except BaseException as e:  # propagate into the consumer
                err.append(e)
            finally:
                q.put(_DONE)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _DONE:
                break
            yield item
        t.join()
        if err:
            raise err[0]
