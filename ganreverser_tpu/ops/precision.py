"""f32-accumulating convolution that stays differentiable at low precision.

The forward idiom everywhere in this framework is ``conv(x_bf16, k_bf16,
preferred_element_type=f32)`` — bf16 operands on the MXU with the full-f32
accumulator kept for the epilogue (BN/bias in f32). But JAX's transpose
rule for ``conv_general_dilated`` rebuilds the gradient convs with the
*f32 cotangent* against the *bf16 operands* and the primitive rejects
mixed dtypes ("requires arguments to have the same dtypes"), so anything
that differentiates through a bf16 conv — bf16 training, the gradient
latent refinement of BASELINE config 5 (analysis/refine.py) — crashed.
(``dot_general``'s transpose handles the mix; only conv is affected.)

``conv_f32acc`` keeps the exact forward and defines the backward
explicitly: the cotangent is cast to the operand dtype and the gradient
convs run at operand precision (the MXU accumulates f32 internally either
way) — standard mixed-precision practice.

f32 operands dispatch straight to ``lax.conv_general_dilated`` (no
custom_vjp): the primitive's own transpose handles same-dtype operands,
the gradients are identical, and full forward-mode AD (jvp/jacfwd/
hessian) is preserved. Only the low-precision path carries the
custom_vjp, which is REVERSE-MODE ONLY — jax.jvp through a bf16 conv
raises, a documented constraint of custom_vjp.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def conv_f32acc(x, k, strides, padding, lhs_dilation, dn):
    """``lax.conv_general_dilated(..., preferred_element_type=f32)`` that
    can be differentiated with low-precision operands (reverse mode; f32
    operands keep full forward+reverse AD via the plain primitive).

    x/k must share a dtype; strides/padding/lhs_dilation/dn are static
    (padding: string or tuple-of-pairs; lhs_dilation: None or tuple)."""
    if x.dtype == jnp.float32:
        return lax.conv_general_dilated(
            x, k, strides, padding,
            lhs_dilation=lhs_dilation, dimension_numbers=dn,
            preferred_element_type=jnp.float32)
    return _conv_lowp(x, k, strides, padding, lhs_dilation, dn)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _conv_lowp(x, k, strides, padding, lhs_dilation, dn):
    return lax.conv_general_dilated(
        x, k, strides, padding,
        lhs_dilation=lhs_dilation, dimension_numbers=dn,
        preferred_element_type=jnp.float32)


def _fwd(x, k, strides, padding, lhs_dilation, dn):
    return _conv_lowp(x, k, strides, padding, lhs_dilation, dn), (x, k)


def _bwd(strides, padding, lhs_dilation, dn, res, ybar):
    x, k = res

    def lo(x_, k_):
        return lax.conv_general_dilated(
            x_, k_, strides, padding,
            lhs_dilation=lhs_dilation, dimension_numbers=dn)

    _, vjp = jax.vjp(lo, x, k)
    gx, gk = vjp(ybar.astype(x.dtype))
    return gx, gk


_conv_lowp.defvjp(_fwd, _bwd)
