"""Space-to-depth evaluation of small-C_in stride-1 convs.

The E2VID head conv (5x5, C_in = 5 voxel bins -> 32, unet.py:140-141 in the
reference) is MXU-hostile as written: XLA's TPU conv lowering runs it at
~4 TF/s on v5e because the contraction (C_in) is far below the 128-lane MXU
tile, costing ~100 ms of every DSEC train step (CLAUDE.md round-1 notes).

TPU-first fix: evaluate the SAME conv in 2x2-block space. For output pixel
(2Y+p, 2X+q) the 5x5 taps read input rows 2Y+p+dy-2 = 2(Y+DY)+r, so the
whole conv is EXACTLY a 3x3 conv over the space-to-depth input
(H/2, W/2, 4*C_in) producing all four output phases at once
(H/2, W/2, 4*C_out):

    contraction 3*3*4*C_in = 180 (vs 5 before), output lanes 4*32 = 128

Both dimensions now land on MXU tile boundaries. The kernel remapping is a
pure reshuffle of the original (5, 5, C_in, C_out) weights, so parameters
(and converted torch checkpoints) are unchanged; gradients flow through the
remap, making this valid for trainable paths too.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _block_index(k: int) -> np.ndarray:
    """idx[ky, r, p] into the (k+2)-padded kernel axis: the original tap
    dy = 2*ky + r - p - (k // 2 - 1) shifted by the zero-pad offset."""
    kb = (k - 2) // 2 + 2  # block-kernel extent (3 for k=5)
    idx = np.zeros((kb, 2, 2), np.int64)
    for ky in range(kb):
        for r in range(2):
            for p in range(2):
                idx[ky, r, p] = 2 * ky + r - p + 1
    return idx


def s2d_kernel(kernel: jax.Array) -> jax.Array:
    """(k, k, C_in, C_out) stride-1 kernel -> (kb, kb, 4*C_in, 4*C_out)
    block-space kernel; k must be odd with k//2 == 2 (i.e. k == 5)."""
    k, k2, cin, cout = kernel.shape
    assert k == k2 == 5, "s2d path is specialized to 5x5 kernels"
    kp = jnp.pad(kernel, ((1, 1), (1, 1), (0, 0), (0, 0)))
    idx = _block_index(k)  # (3, 2, 2), values in [0, 6]
    # gather rows then cols: (3,2,2)(3,2,2) c f
    w = kp[idx.reshape(-1)][:, idx.reshape(-1)]
    w = w.reshape(3, 2, 2, 3, 2, 2, cin, cout)
    #      ky r  p  kx s  q
    # -> (ky, kx, r, s, cin, p, q, cout) -> (3, 3, 4*cin, 4*cout)
    w = w.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return w.reshape(3, 3, 4 * cin, 4 * cout)


def s2d_kernel_stride2(kernel: jax.Array) -> jax.Array:
    """(5, 5, C_in, C_out) STRIDE-2 kernel -> (3, 3, 4*C_in, C_out).

    A 5x5/stride-2 SAME conv reads, for output (Y, X), input rows
    2Y+dy-2 = 2(Y+DY)+r — i.e. it is exactly a 3x3 stride-1 conv over the
    space-to-depth input. This removes the full-resolution intermediate
    between the E2VID head conv and the first recurrent encoder: both run
    in block space and the encoder's output IS the scale-2 feature map.
    """
    k, k2, cin, cout = kernel.shape
    assert k == k2 == 5, "stride-2 s2d path is specialized to 5x5 kernels"
    kp = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
    idx = np.array([[2 * ky + r for r in range(2)] for ky in range(3)])
    w = kp[idx.reshape(-1)][:, idx.reshape(-1)]  # (6, 6, cin, cout)
    w = w.reshape(3, 2, 3, 2, cin, cout).transpose(0, 2, 1, 3, 4, 5)
    return w.reshape(3, 3, 4 * cin, cout)


def conv5x5_s2d_stride2(
    x_s2d: jax.Array, kernel: jax.Array, bias: jax.Array | None,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Stride-2 5x5 conv evaluated on an s2d input: (B, H/2, W/2, 4*C_in)
    -> (B, H/2, W/2, C_out). Equals conv(x, stride=2, SAME-ish pad 2)."""
    w2 = s2d_kernel_stride2(kernel).astype(dtype)
    out = jax.lax.conv_general_dilated(
        x_s2d.astype(dtype), w2, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)
    if bias is not None:
        out = out + bias.astype(dtype)
    return out


def block_kernel(kernel: jax.Array, *, bi: int, bo: int,
                 stride: int = 1) -> jax.Array:
    """General space-to-depth conv-kernel remap.

    For a (K, K, C_in, C_out) SAME conv (pad = K//2) with ``stride``, whose
    input is stored in bi x bi blocks — channel (r*bi + s)*C_in + c — and
    whose output should come out in bo x bo blocks — channel
    (p*bo + q)*C_out + n — returns the exactly equivalent stride-1 block
    kernel (KB, KB, bi^2*C_in, bo^2*C_out). Requires stride*bo == bi so the
    block grids align (the blocked conv is then stride-1).

    Subsumes :func:`s2d_kernel` (bi=bo=2, stride=1) and
    :func:`s2d_kernel_stride2` (bi=2, bo=1, stride=2); also covers the
    quad-block rollout's 4x4 forms and the 3x3 ConvLSTM gate conv
    (bi=bo=2). Pure gather of the original weights — gradients flow
    through, converted checkpoints stay valid.
    """
    k, k2, cin, cout = kernel.shape
    assert k == k2 and k % 2 == 1, kernel.shape
    assert stride * bo == bi, (stride, bo, bi)
    pad = k // 2
    imin = -pad
    imax = stride * (bo - 1) + k - 1 - pad
    dymin = imin // bi
    kb = imax // bi - dymin + 1
    # The blocked conv is applied with SAME padding, which pads
    # lo = (kb-1)//2 — matching this remap's assumed pad_lo = -dymin only
    # for odd kb. Even-kb configs (e.g. k=5, bi=4, bo=1, stride=4) would
    # silently shift every tap by one block; reject them loudly.
    assert kb % 2 == 1 and -dymin == kb // 2, (
        f"block_kernel remap needs odd block-kernel size with centred "
        f"support (kb={kb}, dymin={dymin}); this (k={k}, bi={bi}, bo={bo}, "
        f"stride={stride}) combination requires explicit conv padding")
    # gather index into the kernel axis; K = the appended zero row (taps
    # that fall outside the kernel support)
    idx = np.full((kb, bi, bo), k, np.int64)
    for ky in range(kb):
        for r in range(bi):
            for p in range(bo):
                dy = (ky + dymin) * bi + r - stride * p + pad
                if 0 <= dy < k:
                    idx[ky, r, p] = dy
    kp = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
    w = kp[idx.reshape(-1)][:, idx.reshape(-1)]
    w = w.reshape(kb, bi, bo, kb, bi, bo, cin, cout)
    #              ky r   p   kx  s   q
    w = w.transpose(0, 3, 1, 4, 6, 2, 5, 7)   # ky kx r s cin p q cout
    return w.reshape(kb, kb, bi * bi * cin, bo * bo * cout)


def block_bias(bias: jax.Array, bo: int) -> jax.Array:
    """Tile a conv bias for bo x bo blocked output channels."""
    return jnp.tile(bias, bo * bo)


def segment_input_perm(bi: int, segments: tuple) -> np.ndarray:
    """Input-channel permutation for a concat of separately-blocked operands.

    :func:`block_kernel` expects its input channel layout to be
    ``(sub)*C_total + c`` — the blocking of the CONCATENATED tensor. When the
    input is instead a channel-concat of separately space-to-depth'd
    segments (``[s2d(a) | s2d(b)]``, the natural form for skip connections —
    same trick as :func:`gates_kernel_s2d`'s x|h operand), gather the block
    kernel's input dim with this permutation:
    ``w_seg = w_blk[:, :, segment_input_perm(bi, (Ca, Cb)), :]``.
    """
    ctot = int(sum(segments))
    nsub = bi * bi
    perm = np.empty(nsub * ctot, np.int64)
    base = 0   # offset in the actual concat-of-s2d layout
    off = 0    # channel offset inside the blocked-concat layout
    for seg in segments:
        for sub in range(nsub):
            a = base + sub * seg
            perm[a:a + seg] = sub * ctot + off + np.arange(seg)
        base += nsub * seg
        off += seg
    return perm


def up2x_bilinear_s2d(x: jax.Array) -> jax.Array:
    """``s2d(upsample2x_bilinear(x))`` computed at SOURCE resolution.

    torch-style half-pixel bilinear 2x (align_corners=False) writes output
    parity r from exactly two input rows: ``out[2i] = 0.25 x[i-1] +
    0.75 x[i]`` and ``out[2i+1] = 0.75 x[i] + 0.25 x[i+1]`` (edge-clamped),
    separably per axis — so each of the four s2d subchannels is a weighted
    sum of (edge-replicated) shifts of ``x``. This replaces the decoder
    chain's full-resolution bilinear materialization + space_to_depth
    relayout (both full-size copies) with fused elementwise passes at
    quarter the data. Channel order matches :func:`space_to_depth`:
    ``(r*2 + s)*C + c``. Exact vs
    ``space_to_depth(upsample2x_bilinear(x))`` including borders (the
    replicate pad reproduces the resize's edge clamp).
    """
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")

    def sh(dy, dx):
        return xp[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w, :]

    r0 = 0.25 * sh(-1, 0) + 0.75 * x          # row parity 0
    r1 = 0.75 * x + 0.25 * sh(1, 0)           # row parity 1
    xp0 = jnp.pad(r0, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    xp1 = jnp.pad(r1, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    p00 = 0.25 * xp0[:, :, :w] + 0.75 * r0
    p01 = 0.75 * r0 + 0.25 * xp0[:, :, 2:]
    p10 = 0.25 * xp1[:, :, :w] + 0.75 * r1
    p11 = 0.75 * r1 + 0.25 * xp1[:, :, 2:]
    return jnp.concatenate([p00, p01, p10, p11], axis=-1)


def tile_upsample2x_s2d(x: jax.Array) -> jax.Array:
    """Nearest-2x upsample emitted directly in s2d form — a channel tile.

    ``s2d(up2x(x))[I, J, (r*2+s)*C + c] = up2x(x)[2I+r, 2J+s, c]
    = x[I, J, c]`` for r, s in {0, 1}: every subpixel of the block equals the
    source pixel, so the blocked upsample is ``jnp.tile(x, 4)`` — no spatial
    op, no full-resolution tensor.
    """
    return jnp.tile(x, (1, 1, 1, 4))


def fold_up2x_into_conv(kernel: jax.Array) -> jax.Array:
    """Fold a nearest-2x upsample into the following conv's weights.

    ``conv_kxk(up2x_nearest(x)) == depth_to_space(conv(x, W'))`` exactly:
    output pixel (2i+r, 2j+s) of the upsample-then-conv taps
    ``up(x)[2i+r+ky-p] = x[i + floor((r+ky-p)/2)]`` (p = k//2), so each
    output parity is a small conv directly on ``x`` — original taps that
    land on the same source pixel have their weights summed. One conv emits
    all four parities as s2d channels ``(r*2+s)*C_out + co``.

    Why: the upsample-then-conv stages (segmentation-head scale-1 stage,
    reference style_networks.py:100-104; E2VID decoders) otherwise run at
    doubled resolution with narrow output channels (quarter MXU occupancy)
    and force full-resolution InstanceNorm / logits tensors. Folded, the
    conv contracts at source resolution with 4x wider output: k=3 has
    IDENTICAL total MACs (each parity uses 2 of the 3 taps per axis) and
    k=5 folds to a 3x3 (0.36x the MACs). Parameters are unchanged —
    gradients flow through the (linear) remap.
    """
    k = kernel.shape[0]
    assert kernel.shape[1] == k and k % 2 == 1, kernel.shape
    p = k // 2
    deltas = sorted({(r + ky - p) // 2 for r in (0, 1) for ky in range(k)})
    kp = len(deltas)
    assert -deltas[0] == deltas[-1], deltas  # symmetric -> SAME padding
    tap = np.zeros((2, kp, k), np.float32)   # tap[r, d, ky]
    for r in (0, 1):
        for ky in range(k):
            tap[r, deltas.index((r + ky - p) // 2), ky] = 1.0
    t = jnp.asarray(tap, kernel.dtype)
    w4 = jnp.einsum("ray,sbx,yxio->abrsio", t, t, kernel)
    kk, cin, cout = kp, kernel.shape[2], kernel.shape[3]
    return w4.transpose(0, 1, 4, 2, 3, 5).reshape(kk, kk, cin, 4 * cout)


def up2x_conv_fused(x: jax.Array, kernel: jax.Array,
                    bias: jax.Array | None = None, *,
                    dtype=None) -> jax.Array:
    """``conv_kxk(up2x_nearest(x))`` evaluated at source resolution; output
    is the s2d form (B, h, w, 4*C_out) of the (B, 2h, 2w, C_out) result
    (:func:`fold_up2x_into_conv`)."""
    dtype = dtype or x.dtype
    w4 = fold_up2x_into_conv(kernel).astype(dtype)
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), w4, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)
    if bias is not None:
        out = out + jnp.tile(bias, 4).astype(dtype)
    return out


def tile_upsample2x_s2d_to_s4d(x_s2d: jax.Array) -> jax.Array:
    """Nearest-2x upsample of an s2d tensor, emitted in s4d form.

    Input: s2d of a (2h, 2w, C) tensor = (B, h, w, 4C). Output: s4d of its
    nearest-2x (4h, 4w, C) = (B, h, w, 16C). Derivation: s4d channel
    (r*4+s, c) at block (I, J) reads up[4I+r, 4J+s] = orig[2I + r//2,
    2J + s//2] = x_s2d[I, J, ((r//2)*2 + s//2)*C + c] — a pure broadcast
    of each s2d subchannel to a 2x2 group of s4d subchannels.
    """
    b, h, w, c4 = x_s2d.shape
    c = c4 // 4
    x = x_s2d.reshape(b, h, w, 2, 2, c)            # (r2, s2, c)
    x = jnp.broadcast_to(x[:, :, :, :, None, :, None, :],
                         (b, h, w, 2, 2, 2, 2, c))  # (r2, rr, s2, ss, c)
    return x.reshape(b, h, w, 16 * c)


def gates_kernel_s2d(kernel: jax.Array) -> jax.Array:
    """ConvLSTM gate-conv kernel -> its s2d-operand equivalent.

    ``kernel``: (3, 3, CX + CH, 4*CH), gate order (i, f, o, g) packed on the
    output dim. Returns (3, 3, 4*(CX+CH), 16*CH) whose INPUT dim expects
    concat(x_s2d, h_s2d) — each operand separately space-to-depth'd, i.e.
    channel layout [x: (ph, c)] ++ [h: (ph, c)] — and whose OUTPUT stays
    gate-major: gate g occupies columns [g*4*CH, (g+1)*4*CH) with (ph, c)
    inside, so the cell's i/f/o/g split and the s2d hidden-state layout both
    work unchanged. Exact math (see block_kernel).
    """
    cin, cout = kernel.shape[2], kernel.shape[3]
    ch = cout // 4
    cx = cin - ch
    w = block_kernel(kernel, bi=2, bo=2, stride=1)   # (3,3,4*cin,4*cout)
    # input: blocked order (ph, [x|h]) -> wanted ([ph,x] | [ph,h]):
    # in_perm[new] = old blocked index
    in_perm = np.concatenate([
        (np.arange(4)[:, None] * cin
         + np.arange(cx)[None, :]).reshape(-1),          # all x phases
        (np.arange(4)[:, None] * cin + cx
         + np.arange(ch)[None, :]).reshape(-1),          # all h phases
    ])
    # output: blocked order (ph, g, c) -> wanted (g, ph, c)
    old = (np.arange(4)[:, None, None] * cout
           + np.arange(4)[None, :, None] * ch
           + np.arange(ch)[None, None, :])            # (ph, g, c)
    out_perm = old.transpose(1, 0, 2).reshape(-1)     # (g, ph, c)
    return w[:, :, in_perm, :][:, :, :, out_perm]


def gates_bias_s2d(bias: jax.Array) -> jax.Array:
    """Gate-conv bias -> s2d gate-major layout (matches gates_kernel_s2d)."""
    cout = bias.shape[0]
    ch = cout // 4
    b = jnp.tile(bias, 4).reshape(4, 4, ch)           # (ph, g, c)
    return jnp.transpose(b, (1, 0, 2)).reshape(-1)    # (g, ph, c)


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel = (r*2 + s)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def space_to_depth4(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/4, W/4, 16C); channel = (r*4 + s)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 4, 4, w // 4, 4, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 4, w // 4, 16 * c)


def depth_to_space4(x: jax.Array) -> jax.Array:
    """(B, H/4, W/4, 16C) -> (B, H, W, C); inverse of space_to_depth4."""
    b, hh, ww, c16 = x.shape
    c = c16 // 16
    x = x.reshape(b, hh, ww, 4, 4, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 4 * hh, 4 * ww, c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """(B, H/2, W/2, 4C) -> (B, H, W, C); inverse of :func:`space_to_depth`."""
    b, hh, ww, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, hh, ww, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * hh, 2 * ww, c)


def conv5x5_s2d_blocks(
    x_s2d: jax.Array, kernel: jax.Array, bias: jax.Array | None,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Block-space core: s2d input (B, H/2, W/2, 4*C_in) -> s2d output
    (B, H/2, W/2, 4*C_out). Callers that keep working in block space (the
    recurrent encoder's stride-2 conv consumes exactly this layout) avoid the
    full-resolution round trip entirely."""
    w2 = s2d_kernel(kernel).astype(dtype)
    out = jax.lax.conv_general_dilated(
        x_s2d.astype(dtype), w2, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)
    if bias is not None:
        out = out + jnp.tile(bias, 4).astype(dtype)
    return out


def conv5x5_s2d(
    x: jax.Array, kernel: jax.Array, bias: jax.Array | None,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Drop-in 5x5 stride-1 SAME conv, evaluated in block space.

    Requires even H and W (E2VID inputs are reflection-padded to /2^E,
    ops/pad.py). Matches ``lax.conv_general_dilated`` bit-for-bit in f32.
    """
    b, h, w, _ = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    out = conv5x5_s2d_blocks(space_to_depth(x), kernel, bias, dtype=dtype)
    return depth_to_space(out)
