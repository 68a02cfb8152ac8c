"""Continuous batching of image-generation requests.

BASELINE.json config #5: the reference has no serving layer — its "harness"
is a Colab notebook (sdvar_colab_test.py). This module provides the
production surface: a scheduler that coalesces asynchronously arriving
requests into fixed bucket-size batches and runs the one-jit decode per
bucket (compile cache makes each bucket a one-time cost). Three modes, all
combinable:

  - baseline decode (one VAR);
  - speculative decode (draft/target pair via SpeculativeEngine — pass
    ``draft_cfg``/``draft_params``/``spec``), SpecStats aggregated in
    ``stats``;
  - mesh execution (pass ``mesh_cfg``): VAR weights tensor-parallel over
    "model", batch over "data"; the scheduler stays host-replicated.

Determinism: each request carries its own PRNG seed; sampling uses per-slot
key arrays (ops/sampling.py fold_key), so a request's image is a pure
function of (label, seed, sampling config) — independent of which batch the
scheduler placed it in. Padding slots reuse label 0 with a dummy key and are
dropped before delivery.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sdvar_tpu.config import (
    MeshConfig,
    SamplingConfig,
    SpeculativeConfig,
    VARConfig,
    VQVAEConfig,
)


@dataclass
class Request:
    label: int
    seed: int
    id: int = -1
    submit_t: float = field(default_factory=time.time)


@dataclass
class Result:
    id: int
    image: Optional[np.ndarray]  # (3, H, W) in [0, 1]; None on failure
    latency_s: float
    batch_size: int
    error: Optional[str] = None  # failure payload (exception type: message)

    @property
    def ok(self) -> bool:
        return self.error is None


class GenerationServer:
    """Host-side continuous-batching scheduler over the jitted decode.

    Usage:
        srv = GenerationServer(var_cfg, vae_cfg, var_params, vae_params)
        srv.start()
        fut_id = srv.submit(label=207, seed=42)
        result = srv.get(fut_id, timeout=60)
        srv.stop()
    """

    def __init__(
        self,
        var_cfg: VARConfig, vae_cfg: VQVAEConfig,
        var_params, vae_params,
        samp: SamplingConfig = SamplingConfig(),
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        buckets: Optional[List[int]] = None,
        dtype=jnp.bfloat16,
        kv_mode: str = "bf16",
        draft_cfg: Optional[VARConfig] = None,
        draft_params=None,
        spec: Optional[SpeculativeConfig] = None,
        mesh_cfg: Optional[MeshConfig] = None,
        pixel_sites=None,
        deliver: str = "f32",
    ):
        self.var_cfg, self.vae_cfg = var_cfg, vae_cfg
        self.var_params, self.vae_params = var_params, vae_params
        self.samp = samp
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self.buckets = sorted(buckets or [1, 2, 4, 8])
        self.dtype = dtype
        self.kv_mode = kv_mode
        # calibrated-W8A8 pixel decoder sites (calibrate_decoder_w8a8);
        # None = bf16 NHWC default. bf16 servers only.
        self.pixel_sites = pixel_sites
        # "f32" (default): Result.image is (3,H,W) f32 in [0,1].
        # "u8": device-side quantization, Result.image is (3,H,W) uint8 —
        # 4x less device->host traffic (the e2e bound on tunneled hosts).
        assert deliver in ("f32", "u8"), deliver
        self.deliver = deliver

        # mesh mode: tensor-parallel weights, data-sharded batch
        self.mesh = None
        if mesh_cfg is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from sdvar_tpu.parallel.mesh import (
                create_mesh,
                shard_tree,
                var_param_specs,
            )

            self.mesh = create_mesh(mesh_cfg)
            # Mosaic kernels need explicit sharding under a >1-device mesh
            # (ops/partition docstring); register before any tracing
            from sdvar_tpu.ops.partition import set_tp_mesh

            set_tp_mesh(self.mesh)
            repl = NamedSharding(self.mesh, P())
            self.var_params = shard_tree(
                var_params, var_param_specs(var_cfg), self.mesh)
            self.vae_params = jax.device_put(vae_params, repl)
            if draft_params is not None:
                draft_params = shard_tree(
                    draft_params, var_param_specs(draft_cfg), self.mesh)

        # speculative mode: draft/target pair behind one scheduler
        self.engine = None
        if draft_cfg is not None:
            from sdvar_tpu.engine.speculative import SpeculativeEngine

            assert draft_params is not None
            self.spec = spec or SpeculativeConfig()
            self.engine = SpeculativeEngine(
                vae_cfg, draft_cfg, self.var_cfg,
                self.vae_params, draft_params, self.var_params,
                dtype=dtype, kv_mode=kv_mode,
                # mesh mode: the engine's internally pooled KV caches must be
                # committed to mesh shardings on creation or the second batch
                # pays a full-decode recompile (same fix as the baseline
                # path's place_kv_cache below)
                mesh=self.mesh,
            )

        self._caches: Dict[int, object] = {}  # per-bucket reused KV caches
        self._q: "queue.Queue[Request]" = queue.Queue()
        self._results: Dict[int, Result] = {}
        self._results_cv = threading.Condition()
        self._next_id = 0
        self._id_lock = threading.Lock()
        self._stop = threading.Event()
        self._deliver_stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        # delivery pipeline: the scheduler thread dispatches device work and
        # hands the (async) image arrays to this queue; a delivery thread
        # blocks on device->host transfer and notifies waiters, so batch
        # N+1's decode overlaps batch N's host conversion (JAX dispatch is
        # async — np.asarray is the sync point). Bounded so a slow host
        # can't pile up device buffers.
        self._deliver_q: "queue.Queue" = queue.Queue(maxsize=2)
        self._deliver_thread: Optional[threading.Thread] = None
        self.stats = {
            "completed": 0, "batches": 0, "occupancy_sum": 0.0,
        }
        # stats are updated from both the scheduler and delivery threads;
        # read-modify-writes must not interleave (undercounted failures)
        self._stats_lock = threading.Lock()

    # -- public API ---------------------------------------------------------

    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._deliver_thread = threading.Thread(target=self._deliver_loop,
                                                daemon=True)
        self._thread.start()
        self._deliver_thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
        # The delivery loop polls this event between queue gets, so a
        # healthy-but-busy thread drains every queued batch and exits; a
        # wedged one (device hang inside np.asarray) is abandoned by the
        # bounded join and dies with the process (daemon).
        self._deliver_stop.set()
        if self._deliver_thread is not None:
            self._deliver_thread.join(timeout=30)

    def submit(self, label: int, seed: int) -> int:
        with self._id_lock:
            rid = self._next_id
            self._next_id += 1
        self._q.put(Request(label=label, seed=seed, id=rid))
        return rid

    def get(self, rid: int, timeout: float = 120.0) -> Result:
        deadline = time.time() + timeout
        with self._results_cv:
            while rid not in self._results:
                remaining = deadline - time.time()
                if remaining <= 0:
                    raise TimeoutError(f"request {rid}")
                self._results_cv.wait(remaining)
            return self._results.pop(rid)

    # -- scheduler ----------------------------------------------------------

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _collect(self) -> List[Request]:
        try:
            first = self._q.get(timeout=0.05)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.time() + self.max_wait
        while len(batch) < self.max_batch:
            remaining = deadline - time.time()
            if remaining <= 0:
                break
            try:
                batch.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _place(self, arr):
        """Mesh mode: shard the batch over "data"; no-op otherwise.

        Multi-process SPMD serving (reference production mode: torchrun,
        dist.py:20-49): every process runs the same scheduler over the same
        request stream; each contributes its contiguous per-process slice
        of the global batch (parallel.mesh.shard_batch stitches them with
        no cross-host transfer)."""
        if self.mesh is None:
            return arr
        from jax.sharding import PartitionSpec as P

        from sdvar_tpu.parallel.mesh import shard_batch

        arr = np.asarray(arr)
        if jax.process_count() > 1:
            assert arr.shape[0] % jax.process_count() == 0, \
                (arr.shape, jax.process_count())
            per = arr.shape[0] // jax.process_count()
            r = jax.process_index()
            arr = arr[r * per:(r + 1) * per]
        return shard_batch(self.mesh, arr, P("data"))

    def _place_keys(self, seeds: np.ndarray):
        """Per-request PRNG keys, data-sharded. Typed key arrays can't pass
        through make_array_from_process_local_data, so multi-process mode
        ships the raw key DATA and rebuilds the typed keys in a one-op jit
        under the mesh."""
        keys = jax.vmap(jax.random.key)(jnp.asarray(seeds))
        if self.mesh is None:
            return keys
        if jax.process_count() <= 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.device_put(keys, NamedSharding(self.mesh, P("data")))
        from jax.sharding import NamedSharding, PartitionSpec as P

        from sdvar_tpu.parallel.mesh import shard_batch

        kd = np.asarray(jax.random.key_data(keys))  # (B, key_words)
        per = kd.shape[0] // jax.process_count()
        r = jax.process_index()
        kd_g = shard_batch(self.mesh, kd[r * per:(r + 1) * per],
                           P("data", None))
        return jax.jit(
            jax.random.wrap_key_data,
            out_shardings=NamedSharding(self.mesh, P("data")),
        )(kd_g)

    def _run_batch(self, batch: List[Request]):
        from sdvar_tpu.engine.decode import decode_all_scales
        from sdvar_tpu.models import vqvae as VQ

        n = len(batch)
        bsz = self._bucket_for(n)
        labels = np.zeros((bsz,), np.int32)
        seeds = np.zeros((bsz,), np.uint32)
        for i, r in enumerate(batch):
            labels[i] = r.label
            seeds[i] = np.uint32(r.seed)
        keys = self._place_keys(seeds)
        labels_d = self._place(labels)

        if self.engine is not None:
            # speculative mode: draft/target pair, per-request key streams
            f_hat, spec_stats = self.engine.generate_speculative(
                labels_d, keys, self.spec, self.samp,
            )
            with self._stats_lock:
                for k in ("target_calls", "draft_calls", "accept_count",
                          "reject_count", "forced_accepts"):
                    self.stats["spec_" + k] = (
                        self.stats.get("spec_" + k, 0)
                        + getattr(spec_stats, k)
                    )
        else:
            # per-bucket KV cache, donated + reclaimed each batch:
            # steady-state decode allocates nothing and skips the cache
            # zero-init (~8.5 ms at d30) — the scheduler thread owns the
            # only handle.
            cache = self._caches.pop(bsz, None)
            if cache is None:
                if self.kv_mode == "int8":
                    from sdvar_tpu.ops.quantization import QuantizedKVCache

                    cache = QuantizedKVCache.create(self.var_cfg, 2 * bsz)
                else:
                    from sdvar_tpu.models.var import KVCache

                    cache = KVCache.create(self.var_cfg, 2 * bsz,
                                           dtype=self.dtype)
                if self.mesh is not None:
                    # commit to mesh shardings NOW: otherwise the second
                    # batch (fed the committed returned cache) recompiles
                    # the decode (parallel/mesh.place_kv_cache)
                    from sdvar_tpu.parallel.mesh import place_kv_cache

                    cache = place_kv_cache(cache, self.mesh)
            f_hat, cache = decode_all_scales(
                self.var_cfg, self.vae_cfg, self.var_params,
                self.vae_params["quant"], labels_d, keys,
                self.samp, self.dtype, kv_mode=self.kv_mode,
                cache=cache, return_cache=True,
            )
            self._caches[bsz] = cache
        # fast pixel decode: the CNN decoder dominates end-to-end request
        # cost once the latent decode is quantized (bench_serving: 11.4
        # img/s e2e vs 41.7 latent-only with the f32-HIGHEST decoder).
        # bf16 servers use the channels-last NHWC decoder (tools/
        # bench_pixels.py: the NCHW bf16 path ran at ~12% of peak from
        # layout transposes); f32 servers keep the golden NCHW path.
        if self.pixel_sites is not None and self.dtype == jnp.bfloat16:
            # calibrated W8A8 decoder (models/vqvae.calibrate_decoder_w8a8):
            # opt-in, gated by the operator on the measured pixel-delta for
            # THEIR checkpoint (tools/calib_pixels.py prints the verdict)
            imgs = VQ.fhat_to_img_nhwc_w8a8_static(
                self.vae_cfg, self.vae_params, f_hat, self.pixel_sites)
        elif self.dtype == jnp.bfloat16:
            imgs = VQ.fhat_to_img_nhwc(self.vae_cfg, self.vae_params, f_hat)
        else:
            imgs = VQ.fhat_to_img(self.vae_cfg, self.vae_params, f_hat)
        imgs = (imgs + 1.0) * 0.5
        if self.deliver == "u8":
            # quantize to uint8 ON DEVICE: the device->host pull through the
            # serving tunnel is 4x smaller (12.6 -> 3.2 MB per B=16 batch);
            # callers get (3, H, W) uint8 — the PNG/display-ready form —
            # instead of [0, 1] f32 (round-5: e2e was host-transfer-bound)
            imgs = jnp.clip(imgs * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
        # hand the ASYNC device array to the delivery thread; this thread
        # immediately dispatches the next batch's decode
        self._deliver_q.put((batch, imgs, bsz))

    def _deliver(self, batch: List[Request], imgs, bsz: int):
        # sync point: device -> host. Multi-process SPMD serving: the image
        # batch is a GLOBAL array data-sharded across processes; each
        # process materializes and delivers only the rows it hosts (every
        # process runs the same batches, so every request is delivered by
        # exactly one process — query a request on the process that owns
        # its slot: slot // (bucket / process_count) == process_index).
        if isinstance(imgs, jax.Array) and not imgs.is_fully_addressable:
            rows: Dict[int, np.ndarray] = {}
            for s in imgs.addressable_shards:
                start = s.index[0].start or 0
                data = np.asarray(s.data)
                for j in range(data.shape[0]):
                    rows.setdefault(start + j, data[j])
        else:
            arr = np.asarray(imgs)
            rows = {i: arr[i] for i in range(arr.shape[0])}
        n = len(batch)
        now = time.time()
        delivered = 0
        with self._results_cv:
            for i, r in enumerate(batch):
                if i not in rows:
                    continue  # hosted (and delivered) by another process
                self._results[r.id] = Result(
                    id=r.id, image=rows[i], latency_s=now - r.submit_t,
                    batch_size=bsz,
                )
                delivered += 1
            self._results_cv.notify_all()
        with self._stats_lock:
            self.stats["completed"] += delivered
            self.stats["batches"] += 1
            self.stats["occupancy_sum"] += n / bsz

    def _fail(self, batch: List[Request], err: str):
        now = time.time()
        with self._results_cv:
            for r in batch:
                self._results[r.id] = Result(
                    id=r.id, image=None, latency_s=now - r.submit_t,
                    batch_size=0, error=err,
                )
            self._results_cv.notify_all()
        with self._stats_lock:
            self.stats["failed"] = self.stats.get("failed", 0) + len(batch)
        print(f"[serving] batch failed: {err}")

    def _deliver_loop(self):
        while True:
            try:
                item = self._deliver_q.get(timeout=0.25)
            except queue.Empty:
                if self._deliver_stop.is_set():
                    return  # drained and told to stop
                continue
            batch, imgs, bsz = item
            try:
                self._deliver(batch, imgs, bsz)
            except Exception as e:  # async device error surfaces at sync
                self._fail(batch, f"{type(e).__name__}: {e}")

    def _loop(self):
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            try:
                self._run_batch(batch)
            except Exception as e:  # deliver the error payload to waiters
                self._fail(batch, f"{type(e).__name__}: {e}")
