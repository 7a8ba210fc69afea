"""Isolated decoder fwd/bwd timing: XLA scan vs Pallas mega-kernel."""
import time, os
import numpy as np, jax, jax.numpy as jnp
from speech_recognition_tpu.ops import decoder as D
from speech_recognition_tpu.ops.pallas.decoder_kernel import decoder_fwd_pallas, decoder_bwd_pallas

bf = jnp.bfloat16
N,B,He,S,H,Dv = 127,128,256,255,256,512
rng = np.random.RandomState(0)
f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32), bf)
emb = f(N,B,He)*0.5
tm = jnp.asarray((rng.rand(N,B,1)>0.1).astype(np.float32), bf)
pk, val = f(B,S,H)*0.3, f(B,S,Dv)*0.3
bias = jnp.where(jnp.asarray(rng.rand(B,S)>0.05), 0.0, -1e9).astype(bf)
qw, qb = f(H,H)*0.08, f(H)*0.05
ks = (f(He+Dv,4*H)*0.03, f(H,4*H)*0.05)
rs = (f(H,4*H)*0.05, f(H,4*H)*0.05)
bs = (f(4*H)*0.05, f(4*H)*0.05)
cms = (jnp.ones((B,He+Dv),bf), jnp.ones((B,H),bf))
om = jnp.ones((B,H),bf)
h0, c0 = f(B,H)*0.1, f(B,H)*0.1
args = (emb,tm,pk,val,bias,qw,qb,ks,rs,bs,cms,om,h0,c0)

def timeit_fwd(name, fn, reps=16):
    """Chain h0/c0 through repeated calls so the remote dispatches serialize."""
    def chain(n):
        hh, cc = h0, c0
        for _ in range(n):
            (hh, cc), saved = fn(emb, tm, pk, val, bias, qw, qb, ks, rs, bs, cms, om, hh, cc)
        return float(hh.ravel()[0].astype(jnp.float32))
    chain(1)  # compile+warm
    t0=time.perf_counter(); chain(1); t1=time.perf_counter()-t0
    t0=time.perf_counter(); chain(reps); tn=time.perf_counter()-t0
    print(f"{name}: {(tn-t1)/(reps-1)*1e3:.2f} ms")

fwd_scan = jax.jit(D._decoder_fwd_core)
timeit_fwd("fwd scan", fwd_scan)
timeit_fwd("fwd pallas", decoder_fwd_pallas)

# backward comparison: full vjp of decoder_scan_lstm with flags
def make_vjp(flag_fwd, flag_bwd):
    def run(a):
        os.environ["SRT_PALLAS_DECODER"]=flag_fwd
        os.environ["SRT_PALLAS_DECODER_BWD"]=flag_bwd
        try:
            def loss(a0):
                hid, hl, cl = D.decoder_scan_lstm(*a0)
                return (jnp.sum(hid.astype(jnp.float32))*1e-3 + jnp.sum(hl.astype(jnp.float32)))
            return jax.grad(loss)(a)
        finally:
            os.environ.pop("SRT_PALLAS_DECODER",None); os.environ.pop("SRT_PALLAS_DECODER_BWD",None)
    return jax.jit(run)

def timeit_vjp(name, fn, reps=16):
    def chain(n):
        a = list(args)
        for _ in range(n):
            g = fn(tuple(a))
            a[12] = g[12]  # dh0 -> h0 (bf16 [B,H]): serializes the chain
            a[13] = g[13]
        return float(a[12].ravel()[0].astype(jnp.float32))
    chain(1)
    t0=time.perf_counter(); chain(1); t1=time.perf_counter()-t0
    t0=time.perf_counter(); chain(reps); tn=time.perf_counter()-t0
    print(f"{name}: {(tn-t1)/(reps-1)*1e3:.2f} ms")

timeit_vjp("fwd+bwd scan   ", make_vjp("0","0"))
timeit_vjp("fwd+bwd pallas ", make_vjp("1","1"))
timeit_vjp("fwd pallas/bwd xla", make_vjp("1","0"))
