"""DAGR backbone (``Net``) — the 5-block GNN pyramid, TPU-native.

Reference: src/dagr/model/networks/net.py:30-197. Structure per level i:

    [image-feature concat] -> [+rel-xy features] -> Layer_i -> Pool_i

where ``Layer`` = ConvBlock (spline conv + BN + act) followed by
ConvBlockWithSkip (spline conv + BN, plus linear+BN skip, summed then act)
(reference src/dagr/model/layers/conv.py:10-72).

Everything here is shape-static: level 0 is the padded event table, levels
1..4 are voxel-cell tables produced by :func:`eventad_tpu.ops.pooling.pool_graph`.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.norm import (BatchNormParams, BatchNormState, batch_norm,
                        init_batch_norm)
from ..ops.pooling import pool_graph
from ..ops.spline_conv import (SplineConvParams, init_spline_conv,
                               spline_conv)
from .graph import (Graph, neighbor_rows, sample_image_features,
                    upsample_lookup)


# ---------------------------------------------------------------------------
# parameter pytrees
# ---------------------------------------------------------------------------
class ConvBlockParams(NamedTuple):
    conv: SplineConvParams
    bn: BatchNormParams


class ConvBlockState(NamedTuple):
    bn: BatchNormState


class LayerParams(NamedTuple):
    block1: ConvBlockParams
    skip_lin: jnp.ndarray          # [Cin, Cout] (components.py Linear, bias)
    skip_lin_bias: jnp.ndarray     # [Cout]
    block2: ConvBlockParams
    skip_bn: BatchNormParams


class LayerState(NamedTuple):
    block1: ConvBlockState
    block2: ConvBlockState
    skip_bn: BatchNormState


class BackboneParams(NamedTuple):
    layers: Tuple[LayerParams, ...]   # conv_block1, layer2..layer5


class BackboneState(NamedTuple):
    layers: Tuple[LayerState, ...]


def _act(name: str):
    return {
        "relu": jax.nn.relu,
        "elu": jax.nn.elu,
        "hardtanh": lambda x: jnp.clip(x, -1.0, 1.0),
        "silu": jax.nn.silu,
    }.get(name.lower(), jax.nn.elu)


def init_layer(key, cin: int, cout: int, kernel_size: int) -> tuple:
    k1, k2, k3 = jax.random.split(key, 3)
    b1 = ConvBlockParams(init_spline_conv(k1, cin, cout, kernel_size),
                         init_batch_norm(cout)[0])
    b2 = ConvBlockParams(init_spline_conv(k2, cout, cout, kernel_size),
                         init_batch_norm(cout)[0])
    s = 1.0 / cin ** 0.5
    lin = jax.random.uniform(k3, (cin, cout), minval=-s, maxval=s)
    params = LayerParams(b1, lin, jnp.zeros((cout,)), b2,
                         init_batch_norm(cout)[0])
    state = LayerState(ConvBlockState(init_batch_norm(cout)[1]),
                       ConvBlockState(init_batch_norm(cout)[1]),
                       init_batch_norm(cout)[1])
    return params, state


def _fold_bn_affine(bn: BatchNormParams, st: BatchNormState, bias):
    """Eval-BN as an affine ``a*x + b`` (same arithmetic as
    ops/norm.batch_norm's bf16 path, f32); a leading conv/linear bias folds
    into the offset."""
    f32 = jnp.float32
    a = bn.scale.astype(f32) \
        * jnp.reciprocal(jnp.sqrt(st.var.astype(f32) + 1e-5))
    b = bn.offset.astype(f32) - st.mean.astype(f32) * a
    if bias is not None:
        b = b + a * bias.astype(f32)
    return a, b


def level0_attr_range(bc: "BackboneConfig"):
    """Static level-0 attr bounds from the graph contract: every edge's
    pixel offset satisfies ``|dx|,|dy| <= radius_px`` (the search kernel's
    square cutoff), so the Cartesian attrs lie in a narrow band around 0.5.
    With dagr-S geometry (radius 4 px, cart_max 1/36, 360x240) the spline
    contraction provably touches only a 3x5 tap sub-rectangle of the 5x5
    kernel.  Returns None when no radius is declared."""
    if bc.radius_px <= 0:
        return None
    sx = bc.radius_px / bc.width / (2.0 * bc.cart_max[0])
    sy = bc.radius_px / bc.height / (2.0 * bc.cart_max[0])
    return ((0.5 - sx, 0.5 + sx), (0.5 - sy, 0.5 + sy))


def apply_layer(params: LayerParams, state: LayerState, g: Graph,
                attr: jnp.ndarray = None, *, kernel_size: int, aggr: str,
                activation, training: bool, cart_max: float = None,
                return_pos_nbr: bool = False, grid=None,
                batch_size: int = None, span: int = 2,
                gather_lookback: int = 0,
                attr_range=None, self_slot0: bool = False,
                width: int = None, height: int = None,
                fused_block: int = 128, activation_name: str = None,
                fused_two_block: bool = False, fused_min_rows: int = 0,
                fused2_block: int = 256, fused_shift: bool = True,
                fused_shift_block: int = 256, pos_nbr_pre=None):
    """reference conv.py:59-72: block1 -> block2 with linear skip.

    With ``attr=None`` + ``cart_max``, the layer fetches ONE combined row
    per edge (source xy + features) and derives the Cartesian attrs from it
    — TPU gathers cost a full memory tile per index, so folding the
    position gather into the feature gather halves the per-edge traffic;
    the gathered positions are returned for the downstream pooling when
    ``return_pos_nbr`` is set.

    With ``grid`` (pooled levels), neighbour rows come from dense 2-D
    shifts of the cell table (:func:`neighbor_rows`) instead of gathers —
    the neighbour table at pooled levels is arithmetic offsets, so the
    rows are contiguous slices.

    ``self_slot0``: slot 0 of ``g.nbr`` is the self edge (level-0 layout,
    ev_graph.cu:44-46) whose attr is exactly 0.5; with sum aggregation its
    kernel contribution is the constant center matrix, folded into the conv
    root matmuls so the gather/contraction run on K-1 slots.  The returned
    ``pos_nbr`` (and the matching neighbour columns a downstream pooling
    must use) then exclude slot 0 — harmless, pooling drops self edges
    anyway (reference pooling.py:62)."""
    x_in = g.x
    pos_nbr = None
    x_j1 = None
    dt = x_in.dtype
    fold_self = self_slot0 and aggr == "sum"
    s0 = 1 if fold_self else 0
    nbr = g.nbr[:, s0:]
    nbr_mask = g.nbr_mask[:, s0:]
    if attr is not None and s0:
        attr = attr[:, s0:]

    def rows_of(src, parts=2):
        if grid is not None:
            return neighbor_rows(src, grid, batch_size, span)
        from ..ops.gather_window import gather_rows_auto
        return gather_rows_auto(src, nbr, nbr_mask,
                                lookback=gather_lookback, parts=parts)

    if dt != jnp.float32:
        # cast weights once; positions/attrs are derived in f32 then cast
        params = jax.tree.map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params)

    # fused Pallas path (bf16 inference on TPU): gather + basis + z +
    # kernel matmul in one VMEM kernel per conv block; root/bias/BN/act
    # stay in XLA.  Window contract: level 0 from the event-graph lookback;
    # pooled levels from the grid ordering (neighbour cells are within
    # +-(span*nx+span) rows of the cell table).
    use_fused = (dt == jnp.bfloat16 and not training and aggr == "sum"
                 and jax.default_backend() == "tpu"
                 and (grid is not None
                      or (gather_lookback > 0 and g.off is not None))
                 and (grid is None or x_in.shape[0] >= fused_min_rows))

    if attr is None and g.off is not None and grid is None \
            and width is not None:
        # level 0 with decoded spiral offsets: attrs AND source positions
        # are arithmetic from the per-edge integer pixel offset — the
        # gather fetches features only, and the pooling's source-cell
        # positions are exact (ipos - off is the true integer source pixel;
        # its normalization is bitwise the same division the batch
        # normalizer applied to the source row)
        from ..ops.spline_conv import offset_attr
        offk = g.off[:, s0:]
        attr = offset_attr(offk, nbr_mask, cart_max, width, height)
        if not use_fused:
            x_j1 = rows_of(x_in).astype(dt)
        if return_pos_nbr:
            wh = jnp.asarray([width, height], jnp.float32)
            ipos = jnp.round(g.pos[:, :2] * wh).astype(jnp.int32)
            pos_nbr = (ipos[:, None, :] - offk).astype(jnp.float32) / wh
    elif attr is None and use_fused:
        # pooled fused level: only positions are needed host-side (dense
        # shifts); features are gathered inside the kernel.  The pooling
        # that built this table already shifted the position columns
        # (pool_graph return_pos_nbr) — reuse them instead of a second
        # 25-slice shift set
        pos_nbr = (pos_nbr_pre if pos_nbr_pre is not None
                   else neighbor_rows(g.pos[:, :2], grid, batch_size, span))
        a = (g.pos[:, None, :2] - pos_nbr) / (2.0 * cart_max) + 0.5
        a = jnp.clip(a, 0.0, 1.0)
        attr = jnp.where(nbr_mask[..., None], a, 0.5)
    elif attr is None:
        # combined row fetch stays f32 (gather cost is index-dominated, and
        # positions must stay exact — cell assignment & attrs derive from
        # them); parts=3 makes the Pallas reconstruction bit-exact so the
        # riding positions cannot flip a floor-based cell assignment;
        # features cast to the compute dtype afterwards
        src = jnp.concatenate([g.pos[:, :2], x_in.astype(jnp.float32)],
                              axis=1)
        rows = rows_of(src, parts=3)
        pos_nbr = rows[..., :2]
        x_j1 = rows[..., 2:].astype(dt)
        a = (g.pos[:, None, :2] - pos_nbr) / (2.0 * cart_max) + 0.5
        a = jnp.clip(a, 0.0, 1.0)
        attr = jnp.where(nbr_mask[..., None], a, 0.5)
    attr_f32 = attr
    attr = attr.astype(dt)

    if use_fused and grid is not None and fused_shift \
            and activation_name in ("relu", "elu", "hardtanh", "silu"):
        # pooled levels: the neighbour table is constant flat shifts and
        # the (slot, tap) coefficient matrix is statically sparse — the
        # shift-sliced kernel runs each conv block (tail included) with no
        # gather at all (ops/spline_shift.py)
        from ..ops.spline_shift import prepare_shift, shift_spline_conv
        assert not fold_self
        u = jnp.clip(attr_f32.astype(jnp.float32), 0.0, 1.0) \
            * (kernel_size - 1)
        prep_s = prepare_shift(
            u, nbr_mask, g.node_mask, grid=grid, span=span,
            cart_max=cart_max, width=width, height=height,
            kernel_size=kernel_size, block=fused_shift_block)
        p1, p2 = params.block1.conv, params.block2.conv
        a1, b1 = _fold_bn_affine(params.block1.bn, state.block1.bn, p1.bias)
        a2, b2 = _fold_bn_affine(params.block2.bn, state.block2.bn, p2.bias)
        a_s, b_s = _fold_bn_affine(params.skip_bn, state.skip_bn,
                                   params.skip_lin_bias)
        h = shift_spline_conv(x_in, prep_s, p1.weight, p1.root, a1, b1,
                              kernel_size=kernel_size, act=activation_name)
        out = shift_spline_conv(
            h, prep_s, p2.weight, p2.root, a2, b2,
            kernel_size=kernel_size, act=activation_name,
            skip=(x_in, params.skip_lin, a_s, b_s))
        new_state = LayerState(ConvBlockState(state.block1.bn),
                               ConvBlockState(state.block2.bn),
                               state.skip_bn)
        if return_pos_nbr:
            return g._replace(x=out), new_state, pos_nbr
        return g._replace(x=out), new_state

    if use_fused:
        from ..ops.spline_conv import center_index, tap_ranges
        from ..ops.spline_fused import (fused_spline_conv_prepared,
                                        prepare_fused)
        if grid is not None:
            halo = span * grid[0] + span
            lb, lf = halo, halo
        else:
            lb, lf = gather_lookback, 0
        ranges = (tap_ranges(kernel_size, attr_range) if attr_range
                  else ((0, kernel_size - 1), (0, kernel_size - 1)))
        u = jnp.clip(attr_f32.astype(jnp.float32), 0.0, 1.0) \
            * (kernel_size - 1)
        # two-block fusion (level 0 only: needs lookahead == 0): both
        # convs, the BN affine and the activation in ONE kernel sharing
        # the one-hot compare — the dominant VPU cost of the single-block
        # kernel, paid once.  Wins at t=256 (v5e micro: 2.46 vs 2.92 ms
        # for 2x1blk@128); at t=128 it loses, so it gets its own width.
        use_fused2 = (fused_two_block and grid is None
                      and activation_name in ("relu", "elu", "hardtanh",
                                              "silu"))
        # larger blocks amortize the one-hot build (per-dest cost
        # ~K*(span+t+128)/t) at the price of compile time; t=512 made the
        # tunnel compile pathologically slow (>10 min)
        tblk = min(fused2_block if use_fused2 else fused_block,
                   -(-x_in.shape[0] // 128) * 128)
        prep = prepare_fused(nbr, nbr_mask, u, lookback=lb, lookahead=lf,
                             block=tblk)

        def conv_block(src, p, xj_unused):
            conv = fused_spline_conv_prepared(
                src, prep, p.weight, kernel_size=kernel_size,
                ranges=ranges)
            root = p.root
            if fold_self:
                root = root + p.weight[center_index(kernel_size)]
            out = conv + (src @ root).astype(jnp.float32)
            if p.bias is not None:
                out = out + p.bias
            return jnp.where(g.node_mask[:, None], out, 0.0).astype(dt)
    else:
        def conv_block(src, p, xj):
            return spline_conv(src, nbr, nbr_mask, attr, p,
                               kernel_size=kernel_size, aggr=aggr,
                               node_mask=g.node_mask, x_j=xj,
                               attr_range=attr_range,
                               add_center_to_root=fold_self)

    if use_fused and use_fused2:
        from ..ops.spline_fused import fused_two_block_prepared
        p1, p2 = params.block1.conv, params.block2.conv
        root1, root2 = p1.root, p2.root
        if fold_self:
            ci = center_index(kernel_size)
            root1 = root1 + p1.weight[ci]
            root2 = root2 + p2.weight[ci]
        a1, b1 = _fold_bn_affine(params.block1.bn, state.block1.bn, p1.bias)
        a2, b2 = _fold_bn_affine(params.block2.bn, state.block2.bn, p2.bias)
        a_s, b_s = _fold_bn_affine(params.skip_bn, state.skip_bn,
                                   params.skip_lin_bias)
        out, _ = fused_two_block_prepared(
            x_in, prep, p1.weight, root1, a1, b1, p2.weight, root2,
            g.node_mask, kernel_size=kernel_size, ranges=ranges,
            act=activation_name,
            epilogue=(params.skip_lin, a2, b2, a_s, b_s))
        # eval: all running stats unchanged
        new_state = LayerState(ConvBlockState(state.block1.bn),
                               ConvBlockState(state.block2.bn),
                               state.skip_bn)
        if return_pos_nbr:
            return g._replace(x=out), new_state, pos_nbr
        return g._replace(x=out), new_state
    else:
        # ConvBlock 1: conv -> bn -> act
        h = conv_block(x_in, params.block1.conv, x_j1)
        h, bn1 = batch_norm(h, g.node_mask, params.block1.bn,
                            state.block1.bn, training=training)
        h = activation(h)
        h = jnp.where(g.node_mask[:, None], h, 0.0)
        # ConvBlockWithSkip: conv(h) + bn ; skip = bn(lin(x_in)) ; act(sum)
        h2 = conv_block(h, params.block2.conv,
                        None if use_fused else rows_of(h))
    h2, bn2 = batch_norm(h2, g.node_mask, params.block2.bn, state.block2.bn,
                         training=training)
    skip = x_in @ params.skip_lin + params.skip_lin_bias
    skip, bns = batch_norm(skip, g.node_mask, params.skip_bn, state.skip_bn,
                           training=training)
    out = activation(h2 + skip)
    out = jnp.where(g.node_mask[:, None], out, 0.0)
    new_state = LayerState(ConvBlockState(bn1), ConvBlockState(bn2), bns)
    if return_pos_nbr:
        return g._replace(x=out), new_state, pos_nbr
    return g._replace(x=out), new_state


# ---------------------------------------------------------------------------
# backbone
# ---------------------------------------------------------------------------
class BackboneConfig(NamedTuple):
    """Static geometry derived from Config (hashable for jit)."""
    channels: Tuple[int, ...]
    image_channels: Tuple[int, ...]       # empty if use_image=False
    grids: Tuple[Tuple[int, int], ...]    # 4 pooling grids
    cart_max: Tuple[float, ...]           # attr normalizers per level 0..4
    width: int
    height: int
    batch_size: int
    kernel_size: int
    aggr: str
    activation: str
    pooling_aggr: str
    keep_temporal_ordering: bool
    use_image: bool
    # level-0 neighbour-window depth (the event-graph contract); enables the
    # Pallas windowed row-gather on TPU. 0 = plain XLA gather.
    gather_lookback: int = 0
    # pixel radius of the level-0 graph (search-kernel square cutoff); bounds
    # the level-0 attrs statically -> kernel-tap sub-range (level0_attr_range)
    radius_px: int = 0
    # activation/weight dtype of the frozen feature path ("float32" or
    # "bfloat16"); the forward is HBM-bandwidth-bound, so bf16 halves the
    # dominant traffic. Positions, BN statistics and the recurrent head
    # stay float32.
    compute_dtype: str = "float32"
    # destination-block width of the fused spline-conv kernel (lanes per
    # Pallas block); 128 minimum, larger amortizes the in-kernel one-hot
    fused_block: int = 128
    # both level-0 conv blocks in one kernel (shared one-hot compare).
    # Device-validated: tools/check_fused.py shows the path is as
    # close to the f32 truth as the single-block bf16 path (rel 1.38e-1
    # vs 1.42e-1 at random-init logit scale), and the t=256 micro wins
    # 2.46 vs 2.92 ms (tools/bench_fused.py two 256)
    fused_two_block: bool = True
    # destination-block width for the two-block kernel only (t=128 loses
    # there — the shared window DMA amortizes better at 256)
    fused2_block: int = 256
    # pooled levels use the fused Pallas kernel only when the cell table has
    # at least this many rows (per program, = batch * nx * ny); below it the
    # dense-shift XLA formulation wins on fixed kernel-launch/prep cost
    # (tools/bench_fused.py stream). 0 = always fused (round-3 behaviour).
    fused_min_rows: int = 0
    # pooled levels via the shift-sliced statically-pruned kernel
    # (ops/spline_shift.py) instead of the generic windowed one-hot gather
    fused_shift: bool = True
    # destination-block width of the shift kernel
    fused_shift_block: int = 256
    # level-0 image-feature fetch via the separable-bilinear Pallas
    # kernel (ops/bilinear_sample.py) instead of upsample + row gather.
    # OFF: measured on v5e (tools/bench_bilinear.py) the kernel beats the
    # per-map upsample+gather chain 1.4-1.5x, but the model shares ONE
    # row gather across both concatenated maps (~1.6 ms total) while the
    # kernel pays per map (1.76 + 1.59 ms) — a net loss at model level.
    # Kept as a validated component for per-map sampling call sites.
    bilinear_kernel: bool = False
    # destination-chunk width of the Pallas neighbour-search kernel
    # (Config.search_chunk; the host-staged per-chunk temporal bounds in
    # EventBatch.search_starts are computed for this width)
    search_chunk: int = 64


def make_backbone_config(cfg: Config) -> BackboneConfig:
    ch = cfg.channels()
    grids = tuple(cfg.grid_dims())
    eff = cfg.effective_radius
    poolings = cfg.poolings()
    cart = [eff, 2 * eff] + [2 * max(p[0], p[1]) for p in poolings[1:]]
    img_ch = tuple(ch[1:]) if cfg.use_image else ()
    return BackboneConfig(
        channels=tuple(ch), image_channels=img_ch, grids=grids,
        cart_max=tuple(cart), width=cfg.model_width, height=cfg.model_height,
        batch_size=cfg.batch_size, kernel_size=cfg.kernel_size, aggr=cfg.aggr,
        activation=cfg.activation, pooling_aggr=cfg.pooling_aggr,
        keep_temporal_ordering=cfg.keep_temporal_ordering,
        use_image=cfg.use_image, gather_lookback=cfg.graph_lookback,
        radius_px=cfg.radius_px, compute_dtype=cfg.compute_dtype,
        search_chunk=cfg.search_chunk)


def layer_in_out_channels(bc: BackboneConfig):
    """(cin, cout) per layer, reference net.py:58-97."""
    ch = list(bc.channels)
    inputs = ch[:-1]
    if bc.use_image:
        inputs = [inputs[i] + bc.image_channels[i] for i in range(len(inputs))]
    outputs = ch[1:]
    return [(inputs[i] + 2, outputs[i]) for i in range(5)]


def init_backbone(key, bc: BackboneConfig):
    keys = jax.random.split(key, 5)
    pairs = layer_in_out_channels(bc)
    params, states = [], []
    for k, (cin, cout) in zip(keys, pairs):
        p, s = init_layer(k, cin, cout, bc.kernel_size)
        params.append(p)
        states.append(s)
    return BackboneParams(tuple(params)), BackboneState(tuple(states))


def backbone_forward(params: BackboneParams,
                     state: BackboneState,
                     g0: Graph,
                     image_feats: Optional[Sequence[jnp.ndarray]],
                     bc: BackboneConfig,
                     *,
                     training: bool = False,
                     start_level: int = 0,
                     end_level: int = 5,
                     pos_src0=None,
                     pool_tables=None):
    """Runs the 5-block pyramid.

    Args:
      g0: level-0 event graph; ``g0.x`` is the polarity feature ``[N, 1]``.
      image_feats: 5 NHWC maps (remapped CNN pyramid) or None.
      pool_tables: optional ``[B, sum_l nx*ny, 4]`` host-precomputed
        position tables (data/pool_tables.py), stacked over pooled levels
        in grid order; replaces each max-aggr pooling's position
        add-scatter.

    Returns ``(out3, out4), new_state`` where out3/out4 are Graphs at the
    pool-3 / pool-4 cell tables (reference net.py:165-184).

    ``start_level > 0`` resumes the pyramid from a cached intermediate: g0
    must then be the level ``start_level - 1`` output graph WITH the next
    image features already concatenated (the incremental streaming path).
    """
    act = _act(bc.activation)
    new_states = []
    dt = (jnp.bfloat16 if bc.compute_dtype == "bfloat16" else jnp.float32)
    g = g0._replace(x=g0.x.astype(dt))
    # mirror of apply_layer's use_fused gate for pooled levels: when the
    # fused kernels will run, the pooling's combined shift pass also carries
    # the position columns the conv needs (one shift set per level, not two)
    fused_pooled = (dt == jnp.bfloat16 and not training and bc.aggr == "sum"
                    and jax.default_backend() == "tpu")

    # levels 0 and 1 both sample at the level-0 event positions; upsample
    # those two maps to full resolution (static matmuls) and fetch both
    # feature sets with ONE integer row lookup instead of 8 bilinear tap
    # gathers at event scale
    rows01 = None
    c0 = 0
    if bc.use_image and start_level == 0:
        c0 = image_feats[0].shape[-1]
        n0 = g0.pos.shape[0]
        use_sep = (bc.bilinear_kernel and jax.default_backend() == "tpu"
                   and n0 % bc.batch_size == 0
                   and (n0 // bc.batch_size) % 128 == 0)
        if use_sep:
            # separable bilinear Pallas kernel: no upsample, no gather —
            # the per-event fetch is an MXU y-contraction + VPU x-reduce
            # entirely in VMEM (ops/bilinear_sample.py)
            from ..ops.bilinear_sample import sample_bilinear_mxu
            rows01 = jnp.concatenate(
                [sample_bilinear_mxu(
                    image_feats[i].astype(dt), g0.pos, g0.node_mask,
                    full_width=bc.width, full_height=bc.height,
                    batch_size=bc.batch_size) for i in (0, 1)], axis=1)
        elif (dt == jnp.bfloat16 and not training
              and jax.default_backend() == "tpu" and bc.height % 24 == 0):
            # Pallas flat-layout upsample writer + flat 1-D row gather
            # (ops/upsample_flat.py): the flat table layout cannot be
            # produced copy-free by any XLA dot spelling, and the flat
            # gather runs ~9 ns/row vs ~12.6 for the 3-index 4-D form —
            # chain measured 1.34 vs 1.69 ms (tools/bench_upflat.py)
            from ..ops.upsample_flat import upsample_flat_lookup
            rows01 = upsample_flat_lookup(
                [image_feats[0], image_feats[1]],
                g0.pos, g0.batch, g0.node_mask, bc.width, bc.height)
        else:
            rows01 = upsample_lookup(
                [image_feats[0].astype(dt), image_feats[1].astype(dt)],
                g0.pos, g0.batch, g0.node_mask, bc.width, bc.height,
                mask_rows=False)

    def cat_image(g, level):
        if not bc.use_image:
            return g
        if level == 0:
            f = rows01[:, :c0]
        elif level == 1 and rows01 is not None:
            f = rows01[:, c0:]
        else:
            f = sample_image_features(image_feats[level], g.pos, g.batch,
                                      g.node_mask, bc.width, bc.height)
        return g._replace(x=jnp.concatenate([g.x, f.astype(dt)], axis=1))

    def cat_rel(g):
        # reference net.py:122-123: append normalized xy as features
        rel = jnp.where(g.node_mask[:, None], g.pos[:, :2], 0.0)
        return g._replace(x=jnp.concatenate([g.x, rel.astype(dt)], axis=1))

    outs = []
    # source positions feeding the next pooling's cell assignment; when
    # resuming (start_level>0) the caller may supply them for the first
    # pooling (``pos_src0``, e.g. exact offsets cached by the streaming
    # path) — None falls back to pool_graph's index-gather derivation
    pos_nbr = pos_src0
    for level in range(start_level, end_level):
        if level > 0:
            # next level's CNN features are appended at the *previous* level's
            # node positions, then pooled together (net.py:116,127,140,153,169)
            if level > start_level:
                g = cat_image(g, level)
            aggr = "mean" if level == 4 else bc.pooling_aggr  # net.py:94
            # when the previous level folded out the self edge, pos_src has
            # K-1 columns; pass the matching neighbour columns (the dropped
            # slot is the self edge, which pooling discards anyway)
            s0 = (g.nbr.shape[1] - pos_nbr.shape[1]
                  if pos_nbr is not None else 0)
            ht = None
            if pool_tables is not None and aggr == "max":
                from ..data.pool_tables import table_slices
                lo, hi = table_slices(bc.grids)[level - 1]
                ht = pool_tables[:, lo:hi].reshape(-1, 4)
            want_pos = (fused_pooled and bc.batch_size
                        * bc.grids[level - 1][0] * bc.grids[level - 1][1]
                        >= bc.fused_min_rows)
            pooled = pool_graph(
                g.x, g.pos, g.nbr[:, s0:], g.nbr_mask[:, s0:], g.node_mask,
                g.batch,
                grid=bc.grids[level - 1], batch_size=bc.batch_size,
                width=bc.width, height=bc.height, aggr=aggr,
                span=2, keep_temporal_ordering=bc.keep_temporal_ordering,
                pos_src=pos_nbr, host_table=ht, return_pos_nbr=want_pos)
            pos_nbr_pre = None
            if want_pos:
                pooled, pos_nbr_pre = pooled
            g = Graph(pooled.x, pooled.pos, pooled.nbr, pooled.nbr_mask,
                      pooled.node_mask, pooled.batch)
        else:
            pos_nbr_pre = None
            g = cat_image(g, 0)
        g = cat_rel(g)
        g, ls, pos_nbr = apply_layer(
            params.layers[level], state.layers[level], g,
            cart_max=bc.cart_max[level], kernel_size=bc.kernel_size,
            aggr=bc.aggr, activation=act, training=training,
            return_pos_nbr=True,
            grid=bc.grids[level - 1] if level > 0 else None,
            batch_size=bc.batch_size,
            gather_lookback=bc.gather_lookback if level == 0 else 0,
            attr_range=level0_attr_range(bc) if level == 0 else None,
            self_slot0=level == 0, width=bc.width, height=bc.height,
            fused_block=bc.fused_block, activation_name=bc.activation,
            fused_two_block=bc.fused_two_block,
            fused_min_rows=bc.fused_min_rows,
            fused2_block=bc.fused2_block, fused_shift=bc.fused_shift,
            fused_shift_block=bc.fused_shift_block,
            pos_nbr_pre=pos_nbr_pre)
        new_states.append(ls)
        if level >= 3:
            outs.append(g)      # out3 (after layer4), out4 (after layer5)
    if end_level < 5 and not outs:  # profiling cut: return the last graph
        outs.append(g)
    full_states = list(state.layers[:start_level]) + new_states
    return tuple(outs), BackboneState(tuple(full_states))
