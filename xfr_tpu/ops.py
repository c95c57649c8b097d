"""Primitive tensor ops for the graph IR.

Every op is a pure function ``fwd(params, xs, **attrs) -> y`` over NCHW
activations where ``params`` is a (possibly empty) dict of arrays and ``xs``
is a tuple of input arrays.  Backward rules for excitation backprop are
derived generically with ``jax.vjp`` — for affine ops the vjp is evaluated
with ReLU'd ("positive") weights, matching the reference's weight-swap
machinery (reference: python/xfr/models/whitebox.py:315-330, 371-377).

Op semantics mirror the corresponding torch modules used by the reference
model zoo (reference: python/xfr/models/resnet.py, lightcnn.py,
models/resnet50_128_pytorch/resnet50_128.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------


def _pair(v):
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    return (int(v), int(v))


def _pool_out_size(size, k, s, p, ceil_mode):
    """Output size of a torch pooling op (torch.nn.MaxPool2d semantics).

    With ceil_mode, a window that would start entirely inside the right/bottom
    padding is dropped (torch rule).
    """
    if ceil_mode:
        out = int(math.ceil((size + 2 * p - k) / s)) + 1
        if (out - 1) * s >= size + p:
            out -= 1
    else:
        out = int(math.floor((size + 2 * p - k) / s)) + 1
    return out


# ---------------------------------------------------------------------------
# Forward implementations
# ---------------------------------------------------------------------------


def conv2d(params, xs, *, stride=(1, 1), padding=(0, 0), dilation=(1, 1)):
    """2-D convolution, NCHW x OIHW (reference: resnet.py:116-122;
    dilation used by the detector's res5 stage,
    strface/models/detection/top_layers.py forward)."""
    (x,) = xs
    stride, padding = _pair(stride), _pair(padding)
    dilation = _pair(dilation)
    y = lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    b = params.get("b")
    if b is not None:
        y = y + b[None, :, None, None]
    return y


def linear(params, xs):
    """y = x @ W^T + b (torch.nn.Linear layout: W is [out, in])."""
    (x,) = xs
    y = jnp.dot(x, params["w"].T, preferred_element_type=x.dtype)
    b = params.get("b")
    if b is not None:
        y = y + b
    return y


def batchnorm2d(params, xs, *, eps=1e-5):
    """Inference-mode BatchNorm2d as an explicit affine map.

    Kept un-folded (scale applied as a separate multiply by gamma) so that the
    EBP positive-weight swap can ReLU gamma alone, matching the reference's
    ``module.weight`` swap on BatchNorm (whitebox.py:317-320).
    """
    (x,) = xs
    mean = params["mean"][None, :, None, None]
    var = params["var"][None, :, None, None]
    gamma = params["gamma"][None, :, None, None]
    beta = params["beta"][None, :, None, None]
    return (x - mean) / jnp.sqrt(var + eps) * gamma + beta


def relu(params, xs):
    (x,) = xs
    return jnp.maximum(x, 0)


def maxpool2d(params, xs, *, kernel=(2, 2), stride=None, padding=(0, 0),
              ceil_mode=False):
    (x,) = xs
    kernel, padding = _pair(kernel), _pair(padding)
    stride = kernel if stride is None else _pair(stride)
    n, c, h, w = x.shape
    oh = _pool_out_size(h, kernel[0], stride[0], padding[0], ceil_mode)
    ow = _pool_out_size(w, kernel[1], stride[1], padding[1], ceil_mode)
    pad_h = (padding[0], (oh - 1) * stride[0] + kernel[0] - h - padding[0])
    pad_w = (padding[1], (ow - 1) * stride[1] + kernel[1] - w - padding[1])
    import numpy as _np
    # init must be a concrete scalar: a traced init breaks the vjp
    # linearization of reduce_window under jit.
    init = (_np.array(-_np.inf, x.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else _np.array(_np.iinfo(x.dtype).min, x.dtype))
    return lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, 1, kernel[0], kernel[1]),
        window_strides=(1, 1, stride[0], stride[1]),
        padding=((0, 0), (0, 0), pad_h, pad_w),
    )


def avgpool2d(params, xs, *, kernel=(2, 2), stride=None, padding=(0, 0),
              ceil_mode=False):
    """AvgPool2d with count_include_pad=True (torch default).

    The model zoo only uses configurations where windows tile the input
    exactly (reference: resnet.py:186,211; lightcnn.py:237-240), so dividing
    by the full window size is exact.
    """
    (x,) = xs
    kernel, padding = _pair(kernel), _pair(padding)
    stride = kernel if stride is None else _pair(stride)
    n, c, h, w = x.shape
    oh = _pool_out_size(h, kernel[0], stride[0], padding[0], ceil_mode)
    ow = _pool_out_size(w, kernel[1], stride[1], padding[1], ceil_mode)
    pad_h = (padding[0], (oh - 1) * stride[0] + kernel[0] - h - padding[0])
    pad_w = (padding[1], (ow - 1) * stride[1] + kernel[1] - w - padding[1])
    import numpy as _np
    s = lax.reduce_window(
        x,
        _np.zeros((), x.dtype),
        lax.add,
        window_dimensions=(1, 1, kernel[0], kernel[1]),
        window_strides=(1, 1, stride[0], stride[1]),
        padding=((0, 0), (0, 0), pad_h, pad_w),
    )
    return s / (kernel[0] * kernel[1])


def global_avgpool2d(params, xs):
    """AdaptiveAvgPool2d(1) (used by SENet SE blocks)."""
    (x,) = xs
    return jnp.mean(x, axis=(2, 3), keepdims=True)


def add(params, xs):
    """Residual add exposed as a hooked module (reference: resnet.py:104-108)."""
    x, y = xs
    return x + y


def mul(params, xs):
    """Elementwise (broadcasting) product, e.g. SE gating."""
    x, y = xs
    return x * y


def multiply_const(params, xs, *, c=1.0):
    """Multiply(n) module (reference: resnet.py:160-165)."""
    (x,) = xs
    return x * c


def concat_zero_channels(params, xs, *, mult=1):
    """ConcatChannels: pad channels with zeros by concatenation
    (reference: resnet.py:152-157)."""
    (x,) = xs
    n, c, h, w = x.shape
    zeros = jnp.zeros((n, c * mult, h, w), x.dtype)
    return jnp.concatenate([x, zeros], axis=1)


def split_identity(params, xs):
    """Stand-in for the LightCNN ``Split`` module hook point
    (reference: lightcnn.py:39-45).  The actual split+max happens in the
    (unhooked) ``pair_max`` op that follows."""
    (x,) = xs
    return x


def pair_max(params, xs):
    """torch.max(split[0], split[1]) of a channel-halved tensor
    (reference: lightcnn.py:58-62).  Tie gradients split 0.5/0.5, matching
    torch.max(Tensor, Tensor) backward."""
    (x,) = xs
    c = x.shape[1] // 2
    return jnp.maximum(x[:, :c], x[:, c:])


def flatten(params, xs):
    (x,) = xs
    return x.reshape(x.shape[0], -1)


def l2normalize(params, xs, *, axis=1, eps=1e-12):
    """F.normalize(x, p=2, dim=axis) (reference: resnet.py:250)."""
    (x,) = xs
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def dropout_eval(params, xs):
    """F.dropout at eval time: identity (reference: lightcnn.py:273)."""
    (x,) = xs
    return x


def sigmoid(params, xs):
    (x,) = xs
    return jax.nn.sigmoid(x)


def identity(params, xs):
    (x,) = xs
    return x


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

OPS = {
    "conv2d": conv2d,
    "linear": linear,
    "batchnorm2d": batchnorm2d,
    "relu": relu,
    "maxpool2d": maxpool2d,
    "avgpool2d": avgpool2d,
    "global_avgpool2d": global_avgpool2d,
    "add": add,
    "mul": mul,
    "multiply_const": multiply_const,
    "concat_zero_channels": concat_zero_channels,
    "split_identity": split_identity,
    "pair_max": pair_max,
    "flatten": flatten,
    "l2normalize": l2normalize,
    "dropout_eval": dropout_eval,
    "sigmoid": sigmoid,
    "identity": identity,
}

# Ops whose params are "weights" in the sense of the EBP positive-weight swap
# (reference swaps any module with a .weight attribute, whitebox.py:317-324).
_POS_PARAM_KEYS = {
    "conv2d": ("w",),
    "linear": ("w",),
    "batchnorm2d": ("gamma",),
}
_POS_BIAS_KEYS = {
    "conv2d": ("b",),
    "linear": ("b",),
    "batchnorm2d": ("beta",),
}


def positive_params(op, params, with_bias=False):
    """ReLU the weight (and optionally bias) entries of ``params``.

    Mirrors the 'positive_activation' pre-forward hook
    (reference: whitebox.py:315-324): weight -> relu(weight); bias swapped
    only when the Whitebox was built with with_bias=True (ebp_version 11).
    BatchNorm running statistics are never touched.
    """
    if not params:
        return params
    out = dict(params)
    for k in _POS_PARAM_KEYS.get(op, ()):
        if out.get(k) is not None:
            out[k] = jnp.maximum(out[k], 0)
    if with_bias:
        for k in _POS_BIAS_KEYS.get(op, ()):
            if out.get(k) is not None:
                out[k] = jnp.maximum(out[k], 0)
    return out


def apply_op(op, params, xs, attrs):
    return OPS[op](params, xs, **attrs)


def op_vjp(op, params, xs, attrs, cotangent):
    """Contributions of ``cotangent`` (grad at the op output) to each input.

    Linearized at the clean forward inputs ``xs`` — which is what torch
    autograd does in the reference's 'ebp' mode (forward runs with original
    weights; weights are swapped to W+ only for backward,
    whitebox.py:331-338,371-374), so nonlinear ops (relu/maxpool/pair_max)
    route gradients according to the clean activations while affine ops use
    whatever ``params`` are passed here (positive ones for EBP).
    """
    fn = lambda *inputs: OPS[op](params, inputs, **attrs)
    _, vjp_fn = jax.vjp(fn, *xs)
    return vjp_fn(cotangent)
