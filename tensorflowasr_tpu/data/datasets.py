"""ASR datasets: TSV manifests → static-shape padded numpy batches.

Behavior parity with the reference (``tensorflow_asr/datasets.py``):
  - TSV manifests ``PATH\\tDURATION\\tTRANSCRIPT`` with a header line (:26-29)
  - entry reading + optional shuffle (:268-281)
  - per-item parse: audio decode → tokenize → prepend blank (:294-320)
  - metadata compute/save/load of max input/label lengths — what makes
    static-shape TPU training possible (:203-264)
  - ``get_global_shape``: static padded shapes from metadata (:102-138)
  - padded batching to those shapes with drop_remainder + infinite repeat so
    no partial batch ever reaches the compiler (:339-365)
  - TFRecord variant with sharded GZIP records (:398-472), via the pure
    Python codec in ``tfrecord.py``
  - buffered background prefetch replaces tf.data's AUTOTUNE prefetch

Batches are ``schemas.TrainData`` pytrees of numpy arrays; the trainer
device-puts them sharded over the data mesh.
"""

from __future__ import annotations

import json
import logging
import os
import queue
import random
import threading
from typing import Iterator, Optional

import numpy as np

from tensorflowasr_tpu import schemas
from tensorflowasr_tpu.configs import Config, DatasetConfig
from tensorflowasr_tpu.data import audio as audio_lib
from tensorflowasr_tpu.data import tfrecord
from tensorflowasr_tpu.utils import file_util, math_util

logger = logging.getLogger("tensorflowasr_tpu")

BUFFER_SIZE = 100


def get(tokenizer, dataset_config: DatasetConfig, dataset_type: str = "slice"):
    """Factory (reference datasets.get, :86-99)."""
    if dataset_type == "tfrecord":
        return ASRTFRecordDataset(tokenizer=tokenizer, **vars(dataset_config))
    if dataset_type in ("slice", "generator", ""):
        return ASRSliceDataset(tokenizer=tokenizer, **vars(dataset_config))
    raise ValueError(f"dataset_type must be 'tfrecord' or 'slice', got {dataset_type}")


class ASRDataset:
    """Base dataset over TSV manifests."""

    def __init__(
        self,
        tokenizer,
        stage: str = "train",
        data_paths: Optional[list] = None,
        shuffle: bool = False,
        buffer_size: int = BUFFER_SIZE,
        indefinite: bool = True,
        drop_remainder: bool = True,
        metadata: Optional[str] = None,
        sample_rate: int = 16000,
        name: str = "",
        shard_across_processes: bool = True,
        **kwargs,
    ):
        self.tokenizer = tokenizer
        self.stage = stage
        self.data_paths = list(data_paths or [])
        self.shuffle = shuffle
        self.buffer_size = buffer_size
        self.indefinite = indefinite
        self.drop_remainder = drop_remainder
        self.metadata_path = metadata
        self.sample_rate = sample_rate
        self.name = name
        # multi-host pods: each process iterates a disjoint manifest slice
        # (reference tf.data auto-shard DATA policy, datasets.py:498);
        # metadata/vocab builds still see the full entry list
        self.shard_across_processes = shard_across_processes
        self.entries: list[tuple[str, str, str]] = []
        self.num_entries = 0
        self.max_input_length = 0
        self.max_label_length = 0
        if metadata:
            self.load_metadata()

    # ------------------------------- entries -------------------------------- #

    def read_entries(self):
        if self.entries:
            return
        for path in self.data_paths:
            path = file_util.preprocess_paths(path)
            with open(path, "r", encoding="utf-8") as f:
                lines = f.read().splitlines()
            # first line is the header: PATH\tDURATION\tTRANSCRIPT
            for line in lines[1:]:
                if not line.strip():
                    continue
                parts = line.split("\t", 2)
                if len(parts) == 3:
                    self.entries.append(tuple(parts))
        if self.shuffle:
            random.shuffle(self.entries)
        self.num_entries = len(self.entries)
        logger.info("dataset %s: %d entries", self.name or self.stage, self.num_entries)

    def vocab_generator(self) -> Iterator[str]:
        for _, _, transcript in self.entries:
            yield transcript

    # ------------------------------- metadata ------------------------------- #

    def compute_metadata(self):
        """Scan entries for max input frames (from duration) and max label
        length (tokenizing each transcript) — reference :203-238."""
        self.read_entries()
        for _, duration, transcript in self.entries:
            n_samples = int(float(duration) * self.sample_rate)
            self.max_input_length = max(self.max_input_length, n_samples)
            tokens = self.tokenizer.tokenize(transcript)
            self.max_label_length = max(self.max_label_length, len(tokens))
        return {
            "max_input_length": self.max_input_length,
            "max_label_length": self.max_label_length,
            "num_entries": self.num_entries,
        }

    def save_metadata(self, path: Optional[str] = None):
        path = file_util.preprocess_paths(path or self.metadata_path)
        content = {}
        if os.path.exists(path):
            content = file_util.load_json(path)
        content[self.stage] = self.compute_metadata()
        file_util.save_json(path, content)

    def load_metadata(self, path: Optional[str] = None):
        path = file_util.preprocess_paths(path or self.metadata_path)
        if not path or not os.path.exists(path):
            return
        content = file_util.load_json(path).get(self.stage, {})
        self.max_input_length = content.get("max_input_length", 0)
        self.max_label_length = content.get("max_label_length", 0)
        self.num_entries = content.get("num_entries", self.num_entries)

    def update_metadata(self, path: Optional[str] = None):
        self.load_metadata(path)
        self.save_metadata(path)

    # -------------------------------- parsing ------------------------------- #

    def _load_audio(self, path: str) -> np.ndarray:
        return audio_lib.read_audio(path, sample_rate=self.sample_rate)

    def parse(self, path: str, transcript: str):
        """One example → dict of numpy arrays (reference :294-320)."""
        signal = self._load_audio(path)
        labels = self.tokenizer.tokenize(transcript)
        predictions = self.tokenizer.prepand_blank(labels)
        return {
            "path": path,
            "inputs": np.asarray(signal, np.float32),
            "inputs_length": np.int32(len(signal)),
            "labels": np.asarray(labels, np.int32),
            "labels_length": np.int32(len(labels)),
            "predictions": np.asarray(predictions, np.int32),
            "predictions_length": np.int32(len(predictions)),
        }

    def _process_local_entries(self) -> list:
        """This process's slice of the manifest (all of it single-process)."""
        if not self.shard_across_processes:
            return list(self.entries)
        import jax

        pc, pi = jax.process_count(), jax.process_index()
        if pc <= 1:
            return list(self.entries)
        local = list(self.entries)[pi::pc]
        if not local:
            # an empty slice would busy-spin yielding nothing and deadlock the
            # whole pod at the first collective — fail loudly instead
            raise RuntimeError(
                f"dataset slice for process {pi}/{pc} is empty "
                f"({len(self.entries)} total entries) — every pod host needs at "
                "least one example; shrink the pod or grow the dataset"
            )
        return local

    def examples(self, num_workers: int = 0) -> Iterator[dict]:
        self.read_entries()
        while True:
            entries = self._process_local_entries()
            if self.shuffle:
                random.shuffle(entries)
            if num_workers > 1:
                # decode audio in a thread pool with a bounded look-ahead
                # window, preserving order (the replacement for tf.data's
                # parallel map; audio decode is the input-pipeline hot path)
                from collections import deque
                from concurrent.futures import ThreadPoolExecutor

                window = num_workers * 4
                with ThreadPoolExecutor(max_workers=num_workers) as pool:
                    pending: deque = deque()
                    it = iter(entries)
                    for path, _, transcript in it:
                        pending.append(pool.submit(self.parse, path, transcript))
                        if len(pending) >= window:
                            break
                    for path, _, transcript in it:
                        yield pending.popleft().result()
                        pending.append(pool.submit(self.parse, path, transcript))
                    while pending:
                        yield pending.popleft().result()
            else:
                for path, _, transcript in entries:
                    yield self.parse(path, transcript)
            if not self.indefinite:
                return

    # ------------------------------- batching ------------------------------- #

    def create(
        self,
        batch_size: int,
        padded_input_length: Optional[int] = None,
        padded_label_length: Optional[int] = None,
        prefetch: int = 2,
        num_workers: int = 4,
    ) -> Iterator[schemas.TrainData]:
        """Batched iterator with static padded shapes (TPU requirement)."""
        in_len = padded_input_length or self.max_input_length or None
        lb_len = padded_label_length or self.max_label_length or None

        def batches():
            buf = []
            for ex in self.examples(num_workers=num_workers):
                buf.append(ex)
                if len(buf) == batch_size:
                    yield self._collate(buf, in_len, lb_len)
                    buf = []
            if buf and not self.drop_remainder:
                yield self._collate(buf, in_len, lb_len)

        if prefetch <= 0:
            yield from batches()
            return

        q: queue.Queue = queue.Queue(maxsize=prefetch)
        _END = object()

        def producer():
            try:
                for b in batches():
                    q.put(b)
            finally:
                q.put(_END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                return
            yield item

    @staticmethod
    def _collate(examples: list[dict], input_len: Optional[int], label_len: Optional[int]) -> schemas.TrainData:
        b = len(examples)
        in_len = input_len or max(len(e["inputs"]) for e in examples)
        lb_len = label_len or max(len(e["labels"]) for e in examples)
        inputs = np.zeros((b, in_len), np.float32)
        labels = np.zeros((b, lb_len), np.int32)
        predictions = np.zeros((b, lb_len + 1), np.int32)
        inputs_length = np.zeros((b,), np.int32)
        labels_length = np.zeros((b,), np.int32)
        predictions_length = np.zeros((b,), np.int32)
        for i, e in enumerate(examples):
            n = min(len(e["inputs"]), in_len)
            inputs[i, :n] = e["inputs"][:n]
            inputs_length[i] = n
            u = min(len(e["labels"]), lb_len)
            labels[i, :u] = e["labels"][:u]
            labels_length[i] = u
            predictions[i, : u + 1] = e["predictions"][: u + 1]
            predictions_length[i] = u + 1
        return schemas.TrainData(
            inputs=schemas.TrainInput(
                inputs=inputs, inputs_length=inputs_length, predictions=predictions, predictions_length=predictions_length
            ),
            labels=schemas.TrainLabel(labels=labels, labels_length=labels_length),
        )


class ASRSliceDataset(ASRDataset):
    """Direct audio-file loading (reference ASRSliceDataset, :475-502)."""


class ASRTFRecordDataset(ASRDataset):
    """Sharded TFRecord reading/writing (reference :398-472)."""

    def __init__(self, *args, tfrecords_dir: Optional[str] = None, tfrecords_shards: int = 16, compression: str = "GZIP", **kwargs):
        super().__init__(*args, **kwargs)
        self.tfrecords_dir = file_util.preprocess_paths(tfrecords_dir, isdir=True) if tfrecords_dir else None
        self.tfrecords_shards = tfrecords_shards
        self.compression = compression

    def _shard_path(self, shard_id: int) -> str:
        return os.path.join(self.tfrecords_dir, f"{self.stage}_{shard_id:02d}.tfrecord")

    def create_tfrecords(self) -> bool:
        """Write {path, audio(wav bytes), transcript} examples into shards."""
        if not self.tfrecords_dir:
            raise ValueError("tfrecords_dir is required")
        os.makedirs(self.tfrecords_dir, exist_ok=True)
        if any(os.path.exists(self._shard_path(i)) for i in range(self.tfrecords_shards)):
            logger.info("tfrecords already exist in %s", self.tfrecords_dir)
            return True
        self.read_entries()
        if not self.num_entries:
            return False
        shards = [[] for _ in range(self.tfrecords_shards)]
        for i, (path, _, transcript) in enumerate(self.entries):
            shards[i % self.tfrecords_shards].append((path, transcript))
        for sid, items in enumerate(shards):
            def records():
                for path, transcript in items:
                    signal = self._load_audio(path)
                    # embed as wav bytes for self-describing shards
                    wav = audio_lib.wav_bytes(signal, self.sample_rate)
                    yield tfrecord.encode_example({"path": path, "audio": wav, "transcript": transcript})

            n = tfrecord.write_records(self._shard_path(sid), records(), compression=self.compression)
            logger.info("wrote %d examples to %s", n, self._shard_path(sid))
        return True

    def examples(self, num_workers: int = 0) -> Iterator[dict]:
        if not self.tfrecords_dir or not any(os.path.exists(self._shard_path(i)) for i in range(self.tfrecords_shards)):
            yield from super().examples(num_workers=num_workers)
            return
        if self.shard_across_processes:
            import jax

            if 1 < jax.process_count() and self.tfrecords_shards < jax.process_count():
                # fewer shard files than pod hosts: file-level sharding would
                # leave some hosts with an empty slice (pod deadlock at the
                # first collective) — fall back to per-entry manifest sharding
                logger.warning(
                    "tfrecords_shards=%d < process_count=%d; falling back to per-entry sharding",
                    self.tfrecords_shards,
                    jax.process_count(),
                )
                yield from super().examples(num_workers=num_workers)
                return
        while True:
            shard_ids = list(range(self.tfrecords_shards))
            if self.shard_across_processes:
                import jax

                pc, pi = jax.process_count(), jax.process_index()
                if pc > 1:
                    # shard TFRecord files across pod hosts (DATA policy)
                    shard_ids = shard_ids[pi::pc]
            if self.shuffle:
                random.shuffle(shard_ids)
            for sid in shard_ids:
                p = self._shard_path(sid)
                if not os.path.exists(p):
                    continue
                for rec in tfrecord.read_records(p, compression=self.compression):
                    ex = tfrecord.decode_example(rec)
                    signal, rate = audio_lib.read_wav_bytes(ex["audio"])
                    if signal.ndim > 1:
                        signal = signal.mean(axis=1)
                    if rate != self.sample_rate:
                        signal = audio_lib.resample(signal, rate, self.sample_rate)
                    transcript = ex["transcript"].decode("utf-8")
                    labels = self.tokenizer.tokenize(transcript)
                    predictions = self.tokenizer.prepand_blank(labels)
                    yield {
                        "path": ex["path"].decode("utf-8"),
                        "inputs": np.asarray(signal, np.float32),
                        "inputs_length": np.int32(len(signal)),
                        "labels": np.asarray(labels, np.int32),
                        "labels_length": np.int32(len(labels)),
                        "predictions": np.asarray(predictions, np.int32),
                        "predictions_length": np.int32(len(predictions)),
                    }
            if not self.indefinite:
                return


def get_global_shape(
    config: Config,
    *datasets,
    batch_size: Optional[int] = None,
    num_devices: int = 1,
    num_local_devices: Optional[int] = None,
):
    """Static global shapes from dataset metadata (reference :102-138).

    ``batch_size`` is PER DEVICE (reference: global = bs × num_replicas,
    datasets.py:108). On multi-host pods each process's input pipeline
    feeds only its local share — ``local_batch_size`` = bs × local devices.
    """
    per_device = batch_size or config.learning_config.batch_size
    global_batch = per_device * num_devices
    max_input = max((d.max_input_length for d in datasets), default=0) or None
    max_label = max((d.max_label_length for d in datasets), default=0) or None
    return {
        "batch_size": global_batch,
        "local_batch_size": per_device * (num_local_devices or num_devices),
        "padded_input_length": max_input,
        "padded_label_length": max_label,
    }
