import numpy as np, jax, jax.numpy as jnp
from speech_recognition_tpu.ops import decoder as D
from speech_recognition_tpu.ops.pallas.decoder_kernel import decoder_fwd_pallas
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
core = jax.jit(D._decoder_fwd_core)
(hl,cl),(hid,hs,ci,zs,cps) = core(*args)
(hl2,cl2),(hid2,hs2,ci2,zs2,cps2) = decoder_fwd_pallas(*args)
def cmp(name,a,b,tol=3e-2):
    a,b = np.asarray(a,np.float32), np.asarray(b,np.float32)
    d = np.max(np.abs(a-b)/(np.abs(a)+3e-2))
    print(f"{name}: maxrel {d:.4g} {'OK' if d<tol else 'FAIL'}")
for nm,a,b in [("hidden",hid,hid2),("h_last",hl,hl2),("c_last",cl,cl2),
               ("h_start",hs,hs2),("c_in0",ci,ci2),
               ("z0",zs[0],zs2[0]),("z1",zs[1],zs2[1]),
               ("cp0",cps[0],cps2[0]),("cp1",cps[1],cps2[1])]:
    cmp(nm,a,b)
print("done")
