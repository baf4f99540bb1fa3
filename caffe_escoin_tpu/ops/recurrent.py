"""Recurrent ops: Caffe-style RNN and LSTM over time-major sequences.

Reference: `src/caffe/layers/recurrent_layer.cpp` + `lstm_layer.cpp` /
`rnn_layer.cpp` — Caffe unrolls the recurrence into a static graph; here it
is a `lax.scan` (the XLA-native unroll). Interface parity: inputs are
time-major [T, N, D] with a continuation-indicator sequence cont [T, N]
(0 at sequence starts resets the hidden state — `recurrent_layer.cpp:23-38`).

Caffe LSTM equations (lstm_layer.cpp:180-240):
  [i, f, o, g] = W_x x_t + W_h h_{t-1} + b ;  c_t = f*c + i*g ; h = o*tanh(c)
Caffe RNN (rnn_layer.cpp): h_t = tanh(W_x x_t + W_h h_{t-1} + b)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def rnn_forward(x, cont, wx, wh, b, h0=None):
    """x: [T,N,D], cont: [T,N], wx: [D,H], wh: [H,H], b: [H] -> [T,N,H]."""
    t, n, d = x.shape
    h = x.shape[-1] if h0 is not None else wx.shape[1]
    h_init = h0 if h0 is not None else jnp.zeros((n, wx.shape[1]), x.dtype)

    def step(h_prev, inputs):
        x_t, c_t = inputs
        h_prev = h_prev * c_t[:, None]  # reset at sequence starts
        h_t = jnp.tanh(x_t @ wx + h_prev @ wh + b)
        return h_t, h_t

    _, hs = lax.scan(step, h_init, (x, cont.astype(x.dtype)))
    return hs


def lstm_forward(x, cont, wx, wh, b, h0=None, c0=None):
    """x: [T,N,D]; wx: [D,4H] (gate order i,f,o,g — lstm_layer.cpp),
    wh: [H,4H], b: [4H]. Returns (h_seq [T,N,H], (h_T, c_T))."""
    t, n, d = x.shape
    hidden = wh.shape[0]
    h_init = h0 if h0 is not None else jnp.zeros((n, hidden), x.dtype)
    c_init = c0 if c0 is not None else jnp.zeros((n, hidden), x.dtype)

    def step(carry, inputs):
        h_prev, c_prev = carry
        x_t, cont_t = inputs
        mask = cont_t[:, None]
        h_prev = h_prev * mask
        c_prev = c_prev * mask
        gates = x_t @ wx + h_prev @ wh + b
        i, f, o, g = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        o = jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_t = f * c_prev + i * g
        h_t = o * jnp.tanh(c_t)
        return (h_t, c_t), h_t

    (h_last, c_last), hs = lax.scan(
        step, (h_init, c_init), (x, cont.astype(x.dtype))
    )
    return hs, (h_last, c_last)
