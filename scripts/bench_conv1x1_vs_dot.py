"""Is XLA's 1x1 conv backward HBM-bound pathology avoidable by expressing
the same layer as reshape+dot_general?  Times fwd+bwd of both forms for the
profile's worst layers (group1/group2 at 56x56/28x28, batch 128).

Profile evidence (PERF.md): transpose(jvp) conv_general_dilated for
group1_block1/conv1 costs 1.92 ms/step at ~700 GB/s — far above its
arithmetic floor; dot_general formulations of the same math may let XLA
pick matmul kernels instead.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# (name, batch, H, W, Cin, Cout)  -- the profile's hottest 1x1 layers
SHAPES = [
    ('g1_conv1', 128, 56, 56, 256, 64),
    ('g1_conv3', 128, 56, 56, 64, 256),
    ('g2_proj_s2', 128, 56, 56, 256, 512),   # stride 2
    ('g3_conv1', 128, 14, 14, 1024, 256),
]


def time_fn(fn, carry, iters=20):
  @jax.jit
  def run(c):
    def body(c, _):
      return fn(c), None
    return jax.lax.scan(body, c, None, length=iters)[0]

  c = run(carry)
  jax.block_until_ready(c)
  t0 = time.perf_counter()
  c = run(c)
  _ = np.asarray(jax.tree.leaves(c)[0]).ravel()[:1]
  return (time.perf_counter() - t0) / iters


def main():
  rng = np.random.default_rng(0)
  for name, b, h, w, cin, cout in SHAPES:
    stride = 2 if 's2' in name else 1
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.bfloat16)
    k4 = jnp.asarray(rng.normal(size=(1, 1, cin, cout)) * 0.05, jnp.bfloat16)

    def conv_fb(kern, x=x, stride=stride):
      def loss(kern):
        y = jax.lax.conv_general_dilated(
            x, kern, (stride, stride), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-12
      g = jax.grad(loss)(kern)
      return kern * 0.999 + g.astype(kern.dtype)

    def dot_fb(kern, x=x, stride=stride, cin=cin, cout=cout):
      def loss(kern):
        xs = x[:, ::stride, ::stride, :] if stride > 1 else x
        x2d = xs.reshape(-1, cin)
        y = jax.lax.dot_general(x2d, kern[0, 0],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jnp.sum(y ** 2) * 1e-12
      g = jax.grad(loss)(kern)
      return kern * 0.999 + g.astype(kern.dtype)

    t_conv = time_fn(conv_fb, k4)
    t_dot = time_fn(dot_fb, k4)
    print(json.dumps({'layer': name, 'conv_fb_us': round(t_conv * 1e6, 1),
                      'dot_fb_us': round(t_dot * 1e6, 1),
                      'speedup': round(t_conv / t_dot, 2)}), flush=True)


if __name__ == '__main__':
  main()
