import time, jax, jax.numpy as jnp, numpy as np

def timeit(name, f, args_list):
    o = f(args_list[0]); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for a in args_list: o = f(a)
    jax.block_until_ready(o)
    print(f"{name:48s} {(time.perf_counter()-t0)/len(args_list)*1e3:8.2f} ms")

# 1) gather: random vs sorted indices
N, C, T = 92160, 32, 160000
table = jax.random.normal(jax.random.PRNGKey(0), (T, C))
idx_rand = [jax.random.randint(jax.random.PRNGKey(i), (N,), 0, T) for i in range(6)]
idx_sort = [jnp.sort(i) for i in idx_rand]
g = jax.jit(lambda i: table[i].sum())
timeit("row gather random idx", g, idx_rand)
timeit("row gather sorted idx", g, idx_sort)
# sort + gather + unsort combined
def sg(i):
    order = jnp.argsort(i)
    vals = table[i[order]]
    inv = jnp.argsort(order)
    return vals[inv].sum()
timeit("sort+gather+unsort", jax.jit(sg), idx_rand)

# 2) conv layout: NCHW vs NHWC for the GRU-sized convs
E, Cin, Cout, H, W = 91, 448, 128, 40, 80
w_oihw = jax.random.normal(jax.random.PRNGKey(1), (Cout, Cin, 3, 3)) * 0.01
x_nchw = [jax.random.normal(jax.random.PRNGKey(2+i), (E, Cin, H, W)) for i in range(4)]
conv1 = jax.jit(lambda x: jax.lax.conv_general_dilated(
    x, w_oihw, (1,1), ((1,1),(1,1)), dimension_numbers=("NCHW","OIHW","NCHW")).sum())
timeit("conv 448->128 3x3 NCHW", conv1, x_nchw)
w_hwio = jnp.transpose(w_oihw, (2,3,1,0))
x_nhwc = [jnp.transpose(x, (0,2,3,1)) for x in x_nchw]
conv2 = jax.jit(lambda x: jax.lax.conv_general_dilated(
    x, w_hwio, (1,1), ((1,1),(1,1)), dimension_numbers=("NHWC","HWIO","NHWC")).sum())
timeit("conv 448->128 3x3 NHWC", conv2, x_nhwc)
# bf16 NHWC
conv3 = jax.jit(lambda x: jax.lax.conv_general_dilated(
    x.astype(jnp.bfloat16), w_hwio.astype(jnp.bfloat16), (1,1), ((1,1),(1,1)),
    dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.float32).sum())
timeit("conv 448->128 3x3 NHWC bf16", conv3, x_nhwc)
