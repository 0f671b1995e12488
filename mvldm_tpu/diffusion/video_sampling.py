"""Long-video sampling strategies: anchored and autoregressive.

Host-side orchestration around the jitted DDIM sampler, re-creating the
reference's two strategies (``test_video_anchored:644-902`` and
``test_video_autoregressive:904-1055``):

* **anchored** — generate ``num_anchors_views`` strided anchor views (up to
  four from the single context frame; further anchors in chained windows of
  three, each conditioned on [context0, previous anchor] — reference
  ``diffusion_wrapper.py:744-792``), then fill the remaining frames in
  groups of three, each conditioned on [context0, nearest anchor].
* **autoregressive** — first four targets from the context, then sliding
  windows of three conditioned on [context0, last generated frame].

TPU-first: every UNet-visible shape is bucketed. Anchored/autoregressive use
exactly two (v_c, v_t) buckets — (1, num_anchors) and (2, 3) — so the whole
scene runs with two view-count compilations; ragged tail groups are padded
to the bucket by repeating the last view and the padding outputs are
dropped. Independent fill groups batch along the batch dim, in one
exact-size launch when they fit ``max_parallel_groups``.

Deviation from the reference (improvement): the reference's group-of-3
assignment silently drops up to two trailing frames per scene
(``diffusion_wrapper.py:830-839`` only flushes full groups); here tail groups
are padded and generated, so every requested frame is produced.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera_utils import absolute_to_relative_camera
from .engine import DiffusionEngine


@dataclass
class SceneViews:
    """Host-side per-scene data (batch size 1 semantics, like the reference's
    video samplers which assert b == 1)."""

    images: np.ndarray       # (v, h, w, 3)
    extrinsics: np.ndarray   # (v, 4, 4)
    intrinsics: np.ndarray   # (v, 3, 3)
    index: np.ndarray        # (v,) frame ids


class VideoSampler:
    def __init__(
        self,
        engine: DiffusionEngine,
        unet_params,
        vae_params,
        num_anchors_views: int = 4,
        group_size: int = 3,
        max_parallel_groups: int = 16,
        ar_latent_feedthrough: bool = False,
    ):
        self.engine = engine
        self.unet_params = unet_params
        self.vae_params = vae_params
        self.num_anchors = num_anchors_views
        self.group_size = group_size
        self.ar_latent_feedthrough = ar_latent_feedthrough
        # Fill groups are independent given the anchors, so they run batched
        # along the batch dim (the reference loops them sequentially,
        # ``diffusion_wrapper.py:841-894``) — the single largest throughput
        # win of the anchored strategy on TPU. Capped to bound activations.
        self.max_parallel_groups = max_parallel_groups

        # Host<->device image traffic travels as uint8 (4x fewer bytes than
        # f32; measured ~30-60 MB/s on the tunneled bench chip, so a scene's
        # ~100 MB of f32 frames would cost seconds). Lossless for the real
        # pipeline: dataset images are JPEG-decoded uint8, and the float->
        # uint8 output quantization is exactly what PNG export applies
        # anyway (utils/image_io.prep_image).
        def sample_u8(unet_params, vae_params, ctx_u8, extrinsics, intrinsics,
                      num_target_views, rng):
            images = ctx_u8.astype(jnp.float32) / 255.0
            out = engine.sample(
                unet_params, vae_params, images, extrinsics, intrinsics,
                num_target_views=num_target_views, rng=rng,
            )
            return (jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)

        self._sample = jax.jit(sample_u8, static_argnames=("num_target_views",))

        # Fill-phase sampler with deduplicated per-scene context-frame
        # tables: the anchored fill groups condition on only 1 + num_anchors
        # distinct frames, yet a naive per-group stack would re-upload (and
        # re-VAE-encode) ~2 frames x ~27 groups per scene. Here the unique
        # frames upload and encode ONCE; each group gathers its (ctx0,
        # anchor) latents by index. Documented deviation from per-call
        # encoding: a unique frame's VAE posterior is sampled once per scene
        # instead of once per group — same per-frame marginal, shared across
        # the groups that condition on it.
        #
        # The leading axis batches SCENES (``dispatch_anchored_many``), each
        # scene with its own table. Flattening (S, g) -> S*g rows keeps the
        # per-scene blocks contiguous, so sharding the scene axis over the
        # mesh's ``data`` axis maps whole scenes onto chips with zero
        # cross-device communication.
        def sample_u8_indexed_scenes(unet_params, vae_params, tables_u8,
                                     ctx_idx, extrinsics, intrinsics,
                                     num_target_views, rng):
            k_enc, k_noise = jax.random.split(rng)
            s, u = tables_u8.shape[:2]
            g, v_c = ctx_idx.shape[1:3]
            tables = tables_u8.astype(jnp.float32) / 255.0  # (S, U, h, w, 3)
            table_latents = engine.encode_images(vae_params, tables, k_enc)
            ctx_latents = jax.vmap(lambda tab, idx: tab[idx])(
                table_latents, ctx_idx
            )  # (S, g, v_c, hl, wl, 4)
            flat = ctx_latents.reshape(s * g, v_c, *ctx_latents.shape[3:])
            latents = engine.sample_latents(
                unet_params, flat,
                extrinsics.reshape(s * g, *extrinsics.shape[2:]),
                intrinsics.reshape(s * g, *intrinsics.shape[2:]),
                num_target_views=num_target_views, rng=k_noise,
            )
            out = engine.decode_latents(vae_params, latents)
            return (jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)

        self._sample_indexed_scenes = jax.jit(
            sample_u8_indexed_scenes, static_argnames=("num_target_views",)
        )

        # Latent-feedthrough autoregressive launches (opt-in via
        # ``ar_latent_feedthrough`` / cfg ``test.ar_latent_feedthrough``):
        # a chained window conditions on the previous window's GENERATED
        # LATENT directly instead of VAE-encoding its decoded image. This
        # removes the per-window context encode — both the fed-back frame's
        # decode->encode roundtrip (the reference re-encodes the decoded
        # frame every window, ``diffusion_wrapper.py:941-1055``) and the
        # repeated re-encode of the scene context frame (encoded ONCE per
        # scene here) — from the device timeline; the decode still runs per
        # window, for export only. Documented deviation from reference
        # semantics: the context latent is the denoised latent itself, not
        # encode(decode(latent)), so no VAE roundtrip error compounds
        # across windows.
        def encode_ctx_u8(vae_params, ctx_u8, rng):
            return engine.encode_images(
                vae_params, ctx_u8.astype(jnp.float32) / 255.0, rng
            )

        def sample_latents_fn(unet_params, ctx_latents, extrinsics,
                              intrinsics, num_target_views, rng):
            return engine.sample_latents(
                unet_params, ctx_latents, extrinsics, intrinsics,
                num_target_views=num_target_views, rng=rng,
            )

        def decode_u8(vae_params, latents):
            out = engine.decode_latents(vae_params, latents)
            return (jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)

        self._encode_ctx = jax.jit(encode_ctx_u8)
        self._sample_latents = jax.jit(
            sample_latents_fn, static_argnames=("num_target_views",)
        )
        self._decode_u8 = jax.jit(decode_u8)

    @staticmethod
    def _to_u8(images: np.ndarray) -> np.ndarray:
        """Host-side image quantization for upload. Round-to-nearest
        reconstructs the original uint8 exactly for JPEG-derived floats
        (k/255 stored in f32)."""
        if images.dtype == np.uint8:
            return images
        return (np.clip(images, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)

    # ---------------------------------------------------------------- utils

    def _run(
        self,
        context: SceneViews,
        target: SceneViews,
        rel_index: int,
        rng: jax.Array,
    ) -> jax.Array:
        """One bucketed sampling call; returns (v_t, h, w, 3) uint8 images
        ON DEVICE — callers gather with np.asarray only when the whole
        scene is dispatched, so sequential windows chain in the device
        queue instead of bouncing through the host (the tunnel's
        device<->host round trip costs ~0.1-0.5 s per sync)."""
        v_t = target.extrinsics.shape[0]
        extr = np.concatenate([context.extrinsics, target.extrinsics], axis=0)
        intr = np.concatenate([context.intrinsics, target.intrinsics], axis=0)
        extr = absolute_to_relative_camera(jnp.asarray(extr)[None], rel_index)
        # context.images may be a host numpy array or a device array from a
        # previous window (autoregressive / chained anchors) — jnp.asarray
        # is a no-op for the latter, preserving the async chain.
        if isinstance(context.images, np.ndarray):
            ctx_u8 = jnp.asarray(self._to_u8(context.images))
        else:
            ctx_u8 = context.images
        out = self._sample(
            self.unet_params,
            self.vae_params,
            ctx_u8[None],
            extr,
            jnp.asarray(intr)[None],
            num_target_views=v_t,
            rng=rng,
        )
        return out[0]

    @staticmethod
    def _take(views: SceneViews, idx) -> SceneViews:
        idx = np.asarray(idx)
        return SceneViews(
            images=views.images[idx],
            extrinsics=views.extrinsics[idx],
            intrinsics=views.intrinsics[idx],
            index=views.index[idx],
        )

    @classmethod
    def _cat(cls, a: SceneViews, b: SceneViews) -> SceneViews:
        # Image stacks may mix host frames (the scene context) with device
        # frames (a previous window's output kept on device for async
        # chaining): concatenate on device in that case — np.concatenate
        # would force a host sync.
        imgs = [a.images, b.images]
        if any(not isinstance(x, np.ndarray) for x in imgs):
            imgs = [
                x if not isinstance(x, np.ndarray)
                else jnp.asarray(cls._to_u8(x))
                for x in imgs
            ]
            images = jnp.concatenate(imgs, axis=0)
        else:
            images = np.concatenate(imgs, axis=0)
        return SceneViews(
            images=images,
            extrinsics=np.concatenate([a.extrinsics, b.extrinsics], axis=0),
            intrinsics=np.concatenate([a.intrinsics, b.intrinsics], axis=0),
            index=np.concatenate([a.index, b.index], axis=0),
        )

    def _pad_group(self, views: SceneViews, size: int) -> Tuple[SceneViews, int]:
        """Pad a ragged tail group to the bucket size by repeating the last
        view; returns (padded views, real count)."""
        real = views.extrinsics.shape[0]
        if real == size:
            return views, real
        reps = [views.images[-1:]] * (size - real)
        return SceneViews(
            images=np.concatenate([views.images, *reps], axis=0),
            extrinsics=np.concatenate(
                [views.extrinsics] + [views.extrinsics[-1:]] * (size - real), axis=0
            ),
            intrinsics=np.concatenate(
                [views.intrinsics] + [views.intrinsics[-1:]] * (size - real), axis=0
            ),
            index=np.concatenate(
                [views.index] + [views.index[-1:]] * (size - real), axis=0
            ),
        ), real

    # ------------------------------------------------------------- anchored

    # A dispatched-but-ungathered scene: (device launch output, [(row,
    # frame_index)]) pairs. Produced by dispatch_*, consumed by gather().
    Pending = List[Tuple[jax.Array, List[Tuple[int, int]]]]
    # Scene-batched variant: rows carry (flat row, scene slot, frame index).
    ManyPending = List[Tuple[jax.Array, List[Tuple[int, int, int]]]]

    @staticmethod
    def _submit(pending, out: jax.Array, rows) -> None:
        """Register a launch output and start its device->host DMA NOW: the
        copy engine overlaps the transfer of launch i's images with the
        compute of launches i+1.. in the device queue, so gather()'s
        np.asarray finds the bytes already on the host instead of paying
        the full transfer at the end (~16 MB/scene of uint8 frames)."""
        try:
            out.copy_to_host_async()
        except Exception:
            pass  # non-Array outputs / backends without async copy
        pending.append((out, rows))

    @staticmethod
    def gather(pending: "VideoSampler.Pending") -> Dict[int, np.ndarray]:
        """Materialize a dispatched scene: one host transfer per launch
        output (later launches keep computing while earlier ones copy)."""
        results: Dict[int, np.ndarray] = {}
        for out, rows in pending:
            host = np.asarray(out).reshape(-1, *out.shape[-3:])
            for row, frame_index in rows:
                results[frame_index] = host[row]
        return results

    @staticmethod
    def gather_many(
        pending: "VideoSampler.ManyPending", n_scenes: int
    ) -> List[Dict[int, np.ndarray]]:
        """Materialize a dispatched scene batch into per-scene
        {frame_index: image} dicts (one host transfer per launch output)."""
        results: List[Dict[int, np.ndarray]] = [{} for _ in range(n_scenes)]
        for out, rows in pending:
            host = np.asarray(out).reshape(-1, *out.shape[-3:])
            for row, scene, frame_index in rows:
                results[scene][frame_index] = host[row]
        return results

    def sample_anchored(
        self,
        context: SceneViews,
        target: SceneViews,
        rng: jax.Array,
        limit_frames: Optional[int] = None,
    ) -> Dict[int, np.ndarray]:
        return self.gather(
            self.dispatch_anchored(context, target, rng, limit_frames)
        )

    def dispatch_anchored(
        self,
        context: SceneViews,
        target: SceneViews,
        rng: jax.Array,
        limit_frames: Optional[int] = None,
    ) -> "VideoSampler.Pending":
        """Dispatch a whole scene asynchronously (zero host syncs) and
        return the pending handle; ``gather`` turns it into
        {frame_index: image}. Callers can dispatch scene N+1 before
        gathering scene N to overlap host-side export with device compute.
        Context is reduced to its first view (reference ``:676-677``)."""
        many = self.dispatch_anchored_many(
            [(context, target)], rng, limit_frames=limit_frames
        )
        return [
            (out, [(row, f) for row, _, f in rows]) for out, rows in many
        ]

    def sample_anchored_many(
        self,
        scenes: List[Tuple[SceneViews, SceneViews]],
        rng: jax.Array,
        limit_frames: Optional[int] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ) -> List[Dict[int, np.ndarray]]:
        return self.gather_many(
            self.dispatch_anchored_many(scenes, rng, limit_frames, mesh),
            len(scenes),
        )

    def _shard(self, arr, mesh) -> jax.Array:
        """Upload with the leading (scene) axis sharded over the mesh's
        ``data`` axis; plain device upload when no mesh is given."""
        arr = jnp.asarray(arr) if isinstance(arr, np.ndarray) else arr
        if mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(arr, NamedSharding(mesh, P("data")))

    @staticmethod
    def _pad_cols(idx: np.ndarray, size: int) -> np.ndarray:
        """Pad a target-position column index to a launch bucket size by
        repeating the last entry (padded rows are never submitted)."""
        idx = np.asarray(idx)
        assert len(idx) > 0, "empty position index"
        if len(idx) == size:
            return idx
        return np.concatenate([idx, np.repeat(idx[-1:], size - len(idx))])

    def _prep_scene_batch(self, scenes, limit_frames, mesh, what: str):
        """Shared *_many dispatcher preamble: per-scene take/validation and
        the stacked per-scene camera tables (identical launch structure
        across scenes — it depends only on the common target count)."""
        s = len(scenes)
        prep: List[Tuple[SceneViews, SceneViews]] = []
        for ctx, tgt in scenes:
            if limit_frames is not None:
                tgt = self._take(
                    tgt, np.arange(min(limit_frames, len(tgt.index)))
                )
            prep.append((self._take(ctx, [0]), tgt))
        counts = {len(t.index) for _, t in prep}
        if len(counts) != 1:
            raise ValueError(
                f"{what} requires equal target counts across the scene "
                f"batch; got {sorted(counts)}"
            )
        if mesh is not None and s % mesh.shape["data"] != 0:
            raise ValueError(
                f"scene batch {s} does not divide the mesh's data axis "
                f"({mesh.shape['data']})"
            )
        contexts = [c for c, _ in prep]
        targets = [t for _, t in prep]
        n_t = counts.pop()
        ctx_extr = np.stack([c.extrinsics for c in contexts])  # (S, 1, 4, 4)
        ctx_intr = np.stack([c.intrinsics for c in contexts])
        tgt_extr = np.stack([t.extrinsics for t in targets])   # (S, n_t, ...)
        tgt_intr = np.stack([t.intrinsics for t in targets])
        ctx0_u8 = self._shard(
            np.stack([self._to_u8(c.images) for c in contexts]), mesh
        )  # (S, 1, h, w, 3)
        return s, targets, n_t, ctx_extr, ctx_intr, tgt_extr, tgt_intr, ctx0_u8

    def _make_launch(self, tgt_extr, tgt_intr, mesh):
        """One bucketed (S, v_c) ctx -> (S, v_t) sampling launch; camera
        stacks assembled from the shared per-scene tables."""

        def launch(ctx_imgs, c_extr, c_intr, pos_padded, rel_index, v_t, k):
            extr = np.concatenate([c_extr, tgt_extr[:, pos_padded]], axis=1)
            intr = np.concatenate([c_intr, tgt_intr[:, pos_padded]], axis=1)
            extr = absolute_to_relative_camera(
                self._shard(extr, mesh), rel_index
            )
            return self._sample(
                self.unet_params, self.vae_params, ctx_imgs, extr,
                self._shard(intr, mesh), num_target_views=v_t, rng=k,
            )

        return launch

    def dispatch_anchored_many(
        self,
        scenes: List[Tuple[SceneViews, SceneViews]],
        rng: jax.Array,
        limit_frames: Optional[int] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ) -> "VideoSampler.ManyPending":
        # Publish the mesh while the launches trace so Pallas-backed ops
        # wrap themselves in shard_map (parallel/tp.run_manual — required
        # for multi-device Mosaic lowering).
        from ..parallel.tp import published_mesh

        with published_mesh(mesh):
            return self._dispatch_anchored_many(
                scenes, rng, limit_frames, mesh
            )

    def _dispatch_anchored_many(
        self,
        scenes: List[Tuple[SceneViews, SceneViews]],
        rng: jax.Array,
        limit_frames: Optional[int] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ) -> "VideoSampler.ManyPending":
        """Dispatch a BATCH of scenes asynchronously, scenes stacked along
        the batch axis of every launch. TPU-native eval scaling: with a
        ``mesh``, the scene axis shards over the mesh's ``data`` axis, so S
        scenes on N chips run as S/N scenes per chip with ZERO cross-device
        communication (every op in the sampler is batched over scenes; the
        reference distributes eval only process-per-GPU via Lightning DDP).
        All scenes must share one target count (the RE10K video protocol's
        limit_frames=80 guarantees this; callers bucket otherwise).
        ``gather_many`` turns the handle into per-scene dicts. Single-scene
        ``dispatch_anchored`` delegates here with S=1 — identical launch
        shapes (modulo the leading scene axis) and RNG fold structure, so
        results match the pre-batched implementation bit-for-bit."""
        (s, targets, n_t, ctx_extr, ctx_intr, tgt_extr, tgt_intr,
         ctx0_u8) = self._prep_scene_batch(
            scenes, limit_frames, mesh, "dispatch_anchored_many"
        )

        n_anchors = min(self.num_anchors, n_t)
        anchor_step = max(n_t // n_anchors, 1)
        anchor_pos = np.arange(anchor_step, (n_anchors + 1) * anchor_step,
                               anchor_step)[:n_anchors]
        anchor_pos = anchor_pos[anchor_pos < n_t]
        if len(anchor_pos) == 0:
            # n_t == 1: the single target frame is its own anchor.
            anchor_pos = np.asarray([n_t - 1])

        # The whole batch is dispatched WITHOUT host syncs — anchor outputs
        # stay on device (feeding the chained windows and the fill-phase
        # context tables as device slices) and results materialize in one
        # gather at the end.
        pending: VideoSampler.ManyPending = []
        pad_cols = self._pad_cols
        launch = self._make_launch(tgt_extr, tgt_intr, mesh)

        # Anchor generation. The first window draws up to four anchors from
        # the context alone; when num_anchors_views > 4 the remaining anchors
        # are generated in chained windows of three, each conditioned on
        # [context0, the previous window's last anchor] — the reference's
        # chained-anchor structure (diffusion_wrapper.py:744-792). Documented
        # deviation: the reference's chained loop samples each window with
        # the extrinsics of target slice [start:end:anchor_step] but labels
        # the outputs with indices [start+4*anchor_step : end+4*anchor_step]
        # (diffusion_wrapper.py:753-767 vs :748) — frames rendered at one
        # pose, saved under another. Here the conditioning poses and the
        # saved indices refer to the same anchor positions.
        first_n = min(len(anchor_pos), 4)
        first_bucket = min(self.num_anchors, 4)
        rng, k = jax.random.split(rng)
        anchors = launch(
            ctx0_u8, ctx_extr, ctx_intr,
            pad_cols(anchor_pos[:first_n], first_bucket),
            rel_index=0, v_t=first_bucket, k=k,
        )  # (S, first_bucket, h, w, 3) device
        self._submit(
            pending, anchors,
            [(sc * first_bucket + i, sc, int(targets[sc].index[pos]))
             for sc in range(s)
             for i, pos in enumerate(anchor_pos[:first_n])],
        )
        # Device columns per anchor rank, feeding the fill-phase tables.
        anchor_cols: List[jax.Array] = [
            anchors[:, i] for i in range(first_n)
        ]

        real = first_n
        last_anchor_pos = int(anchor_pos[first_n - 1])
        last_anchor_img = anchors[:, real - 1]  # (S, h, w, 3)
        start = first_n
        while start < len(anchor_pos):
            end = min(start + self.group_size, len(anchor_pos))
            ctx2_u8 = jnp.concatenate(
                [ctx0_u8, last_anchor_img[:, None]], axis=1
            )
            c2_extr = np.concatenate(
                [ctx_extr, tgt_extr[:, [last_anchor_pos]]], axis=1
            )
            c2_intr = np.concatenate(
                [ctx_intr, tgt_intr[:, [last_anchor_pos]]], axis=1
            )
            rng, k = jax.random.split(rng)
            # rel_index=1: poses relative to the previous anchor (reference
            # diffusion_wrapper.py:769). Same (2, 3) shape bucket as the
            # fill phase, so chaining adds no new compilations.
            real = end - start
            imgs = launch(
                ctx2_u8, c2_extr, c2_intr,
                pad_cols(anchor_pos[start:end], self.group_size),
                rel_index=1, v_t=self.group_size, k=k,
            )
            self._submit(
                pending, imgs,
                [(sc * self.group_size + i, sc,
                  int(targets[sc].index[pos]))
                 for sc in range(s)
                 for i, pos in enumerate(anchor_pos[start:end])],
            )
            anchor_cols.extend(imgs[:, i] for i in range(real))
            last_anchor_pos = int(anchor_pos[end - 1])
            last_anchor_img = imgs[:, real - 1]
            start = end

        # Assign remaining frames to the nearest anchor, in groups.
        remaining = [p for p in range(n_t) if p not in set(anchor_pos.tolist())]
        anchor_of = {
            p: int(anchor_pos[np.argmin(np.abs(anchor_pos - p))]) for p in remaining
        }
        groups_by_anchor: Dict[int, List[List[int]]] = {
            int(a): [] for a in anchor_pos
        }
        # Group in frame order (mirrors the reference's per-anchor grouping,
        # but flushing ragged tails instead of dropping them).
        current: List[int] = []
        current_anchor: Optional[int] = None
        for p in remaining:
            a = anchor_of[p]
            if current_anchor is None:
                current_anchor = a
            if a != current_anchor or len(current) == self.group_size:
                groups_by_anchor[current_anchor].append(current)
                current = []
                current_anchor = a
            current.append(p)
        if current:
            groups_by_anchor[current_anchor].append(current)

        # Collect all fill jobs, then run them batched (groups are mutually
        # independent given the anchors). Context frames go into ONE shared
        # per-scene device table — ctx0 + the anchors, padded to a fixed
        # 1+num_anchors size so the compiled shape is stable — and each job
        # references its (ctx0, anchor) pair by index (see
        # ``sample_u8_indexed_scenes``). The anchor columns are DEVICE slices
        # of the anchor launches, so the fill phase chains onto them in the
        # device queue with no host sync.
        anchor_rank = {int(a): r for r, a in enumerate(anchor_pos)}
        table_cols = [ctx0_u8[:, 0]] + anchor_cols
        while len(table_cols) < 1 + self.num_anchors:
            table_cols.append(table_cols[-1])
        tables_u8 = jnp.stack(table_cols, axis=1)  # (S, U, h, w, 3)

        jobs = []  # (ctx_idx (2,), anchor target-position, padded positions, group)
        for a_pos, groups in groups_by_anchor.items():
            if not groups:
                continue
            ctx_idx = np.asarray([0, 1 + anchor_rank[int(a_pos)]], np.int32)
            for group in groups:
                jobs.append(
                    (ctx_idx, a_pos,
                     pad_cols(np.asarray(group), self.group_size), group)
                )

        # Greedy power-of-two chunking: at most log2(cap)+1 distinct batch
        # shapes ever compile, with near-zero padding waste (the standard
        # 80-frame scene's 27 groups run as 16 + 8 + 2 + 1 at S=1). The cap
        # scales with the per-device scene count so per-chip batch stays at
        # max_parallel_groups rows regardless of how many scenes batch
        # together. Measured alternative (rejected): one exact-size launch
        # of all 27 groups was ~0.9 f/s SLOWER — per-frame cost at b=27 is
        # no better than b=16 and the single launch loses the chunk-level
        # overlap of host prep / result transfers with device compute.
        n_shards = mesh.shape["data"] if mesh is not None else 1
        cap = max(1, (self.max_parallel_groups * n_shards) // s)
        cap = 1 << (cap.bit_length() - 1)  # floor to a power of two
        buckets = []
        size = cap
        while size >= 1:
            buckets.append(size)
            size //= 2
        v_fill = self.group_size
        start = 0
        while start < len(jobs):
            left = len(jobs) - start
            bucket = next(b for b in buckets if b <= left or b == 1)
            chunk = jobs[start : start + min(bucket, left)]
            start += len(chunk)
            real_chunk = len(chunk)
            while len(chunk) < bucket:
                chunk.append(chunk[-1])
            # (S, g, v) camera stacks: every scene runs the same group
            # structure over its own cameras.
            ctx_idx = np.broadcast_to(
                np.stack([j[0] for j in chunk]), (s, bucket, 2)
            ).copy()
            extr = np.stack(
                [
                    np.concatenate(
                        [ctx_extr[:, 0:1], tgt_extr[:, [j[1]]],
                         tgt_extr[:, j[2]]], axis=1
                    )
                    for j in chunk
                ],
                axis=1,
            )  # (S, g, 2+group_size, 4, 4)
            intr = np.stack(
                [
                    np.concatenate(
                        [ctx_intr[:, 0:1], tgt_intr[:, [j[1]]],
                         tgt_intr[:, j[2]]], axis=1
                    )
                    for j in chunk
                ],
                axis=1,
            )
            # rel_index=1: poses relative to the anchor (reference :881).
            extr = absolute_to_relative_camera(self._shard(extr, mesh), 1)
            rng, k = jax.random.split(rng)
            # Submit without syncing; gather after all chunks are in flight.
            out = self._sample_indexed_scenes(
                self.unet_params, self.vae_params, tables_u8,
                self._shard(jnp.asarray(ctx_idx, dtype=jnp.int32), mesh),
                extr, self._shard(intr, mesh),
                num_target_views=v_fill, rng=k,
            )  # (S * g, v_t, h, w, 3)
            rows = []
            for sc in range(s):
                for g, (ctx_idx_j, a_pos, padded, group) in enumerate(
                    chunk[:real_chunk]
                ):
                    rows.extend(
                        ((sc * bucket + g) * v_fill + i, sc,
                         int(targets[sc].index[p]))
                        for i, p in enumerate(group)
                    )
            self._submit(pending, out, rows)
        return pending

    # ------------------------------------------------------- autoregressive

    def sample_autoregressive_many(
        self,
        scenes: List[Tuple[SceneViews, SceneViews]],
        rng: jax.Array,
        limit_frames: Optional[int] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ) -> List[Dict[int, np.ndarray]]:
        return self.gather_many(
            self.dispatch_autoregressive_many(scenes, rng, limit_frames, mesh),
            len(scenes),
        )

    def dispatch_autoregressive_many(
        self,
        scenes: List[Tuple[SceneViews, SceneViews]],
        rng: jax.Array,
        limit_frames: Optional[int] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ) -> "VideoSampler.ManyPending":
        # See dispatch_anchored_many: mesh published while launches trace.
        from ..parallel.tp import published_mesh

        with published_mesh(mesh):
            return self._dispatch_autoregressive_many(
                scenes, rng, limit_frames, mesh
            )

    def _dispatch_autoregressive_many(
        self,
        scenes: List[Tuple[SceneViews, SceneViews]],
        rng: jax.Array,
        limit_frames: Optional[int] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ) -> "VideoSampler.ManyPending":
        """Scene-batched autoregressive sampling: S scenes advance their
        sliding windows in lockstep, stacked along the batch axis of every
        launch (and sharded scene-per-chip over a mesh's ``data`` axis when
        given). The single-scene path runs every window at batch 1 — the
        most underutilized launches in the framework — so batching scenes
        is the dominant throughput lever for this mode. Same async
        device-chaining as the single-scene path: window N's context is a
        device slice of window N-1's output, one gather at the end."""
        (s, targets, n_t, ctx_extr, ctx_intr, tgt_extr, tgt_intr,
         ctx0_u8) = self._prep_scene_batch(
            scenes, limit_frames, mesh, "dispatch_autoregressive_many"
        )
        n_initial = min(self.num_anchors, n_t)
        pad_cols = self._pad_cols
        feed_latents = self.ar_latent_feedthrough

        if feed_latents:
            # Scene context encoded once; windows condition on latents.
            rng, k_enc = jax.random.split(rng)
            ctx0_lat = self._encode_ctx(self.vae_params, ctx0_u8, k_enc)

            def launch(ctx_lat, c_extr, c_intr, pos_padded, rel_index,
                       v_t, k):
                extr = np.concatenate(
                    [c_extr, tgt_extr[:, pos_padded]], axis=1
                )
                intr = np.concatenate(
                    [c_intr, tgt_intr[:, pos_padded]], axis=1
                )
                extr = absolute_to_relative_camera(
                    self._shard(extr, mesh), rel_index
                )
                return self._sample_latents(
                    self.unet_params, ctx_lat, extr,
                    self._shard(intr, mesh), num_target_views=v_t, rng=k,
                )
        else:
            launch = self._make_launch(tgt_extr, tgt_intr, mesh)

        pending: VideoSampler.ManyPending = []
        rng, k = jax.random.split(rng)
        real = n_initial
        out = launch(
            ctx0_lat if feed_latents else ctx0_u8, ctx_extr, ctx_intr,
            pad_cols(np.arange(n_initial), self.num_anchors),
            rel_index=0, v_t=self.num_anchors, k=k,
        )  # (S, num_anchors, h, w, 3) images, or latents when feeding
        images = (
            self._decode_u8(self.vae_params, out) if feed_latents else out
        )
        self._submit(
            pending, images,
            [(sc * self.num_anchors + i, sc, int(targets[sc].index[i]))
             for sc in range(s)
             for i in range(real)],
        )

        last_pos = n_initial - 1
        last = out[:, real - 1]  # (S, h, w, 3) image or (S, hl, wl, 4) latent
        start = n_initial
        while start < n_t:
            end = min(start + self.group_size, n_t)
            rng, k = jax.random.split(rng)
            if feed_latents:
                ctx2 = jnp.concatenate([ctx0_lat, last[:, None]], axis=1)
            else:
                ctx2 = jnp.concatenate([ctx0_u8, last[:, None]], axis=1)
            c2_extr = np.concatenate(
                [ctx_extr, tgt_extr[:, [last_pos]]], axis=1
            )
            c2_intr = np.concatenate(
                [ctx_intr, tgt_intr[:, [last_pos]]], axis=1
            )
            real = end - start
            out = launch(
                ctx2, c2_extr, c2_intr,
                pad_cols(np.arange(start, end), self.group_size),
                rel_index=1, v_t=self.group_size, k=k,
            )
            images = (
                self._decode_u8(self.vae_params, out) if feed_latents
                else out
            )
            self._submit(
                pending, images,
                [(sc * self.group_size + i, sc,
                  int(targets[sc].index[p]))
                 for sc in range(s)
                 for i, p in enumerate(range(start, end))],
            )
            last_pos = end - 1
            last = out[:, real - 1]
            start = end
        return pending

    def sample_autoregressive(
        self,
        context: SceneViews,
        target: SceneViews,
        rng: jax.Array,
        limit_frames: Optional[int] = None,
    ) -> Dict[int, np.ndarray]:
        return self.gather(
            self.dispatch_autoregressive(context, target, rng, limit_frames)
        )

    def dispatch_autoregressive(
        self,
        context: SceneViews,
        target: SceneViews,
        rng: jax.Array,
        limit_frames: Optional[int] = None,
    ) -> "VideoSampler.Pending":
        if limit_frames is not None:
            target = self._take(target, np.arange(min(limit_frames, len(target.index))))
        context = self._take(context, [0])

        n_t = len(target.index)
        n_initial = min(self.num_anchors, n_t)

        # Every window's poses are known up front, so the full chain is
        # dispatched without a single host sync: window N's context image is
        # a DEVICE slice of window N-1's output, and JAX async dispatch
        # pipelines the chain (denoise of window N overlaps the VAE decode
        # and transfer of window N-1). One gather at the end. The reference
        # round-trips every window through the host
        # (diffusion_wrapper.py:904-1055).
        pending: List[Tuple[jax.Array, List[Tuple[int, int]]]] = []

        rng, k = jax.random.split(rng)
        initial = self._take(target, np.arange(n_initial))
        initial_padded, real = self._pad_group(initial, self.num_anchors)
        images = self._run(context, initial_padded, rel_index=0, rng=k)[:real]
        self._submit(
            pending, images, [(i, int(target.index[i])) for i in range(real)]
        )

        last_pos = n_initial - 1
        last_image = images[real - 1]
        start = n_initial
        while start < n_t:
            end = min(start + self.group_size, n_t)
            rng, k = jax.random.split(rng)
            last_ctx = SceneViews(
                images=last_image[None],
                extrinsics=target.extrinsics[last_pos][None],
                intrinsics=target.intrinsics[last_pos][None],
                index=target.index[last_pos][None],
            )
            ctx2 = self._cat(context, last_ctx)
            gviews, real = self._pad_group(
                self._take(target, np.arange(start, end)), self.group_size
            )
            images = self._run(ctx2, gviews, rel_index=1, rng=k)[:real]
            self._submit(
                pending, images,
                [(i, int(target.index[p]))
                 for i, p in enumerate(range(start, end))],
            )
            last_pos = end - 1
            last_image = images[real - 1]
            start = end
        return pending
