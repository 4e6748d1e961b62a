import time, random, sys, ctypes
import numpy as np, pyarrow as pa
from sassy_ray.kernel import native
from sassy_ray.kernel.profiles import get_profile

tlen=int(sys.argv[1]); k=int(sys.argv[2]); mix=sys.argv[3] if len(sys.argv)>3 else "mutated"
rng = random.Random(5)
ab = bytes(range(97,123)) + b"    "
def rnd(n): return bytes(rng.choice(ab) for _ in range(n))
n=4096
pats=[]; txts=[]
for i in range(n):
    p = rnd(tlen)
    if mix=="identical": t=p
    elif mix=="random": t=rnd(tlen)
    else:
        b=bytearray(p)
        for _ in range(rng.randint(0,2*k+6)): b[rng.randrange(len(b))]=rng.choice(ab)
        t=bytes(b)
    pats.append(p); txts.append(t)
prof = get_profile("ascii_ci")
pa_p=pa.array([x.decode() for x in pats]); pa_t=pa.array([x.decode() for x in txts])
nb = native.NativeBatch(pa_p, pa_t, prof, k)
k_arr = np.full(n, k, dtype=np.int64)

libs = {}
for name, path in (("old","/tmp/old.so"),("new","/tmp/new.so")):
    lib = ctypes.CDLL(path)
    lib.sassy_scan.argtypes = native._lib.sassy_scan.argtypes
    lib.sassy_scan.restype = ctypes.c_int64
    libs[name] = lib

_ptr = native._ptr
out_best = np.empty(n, dtype=np.int32)
def run(lib):
    lib.sassy_scan(_ptr(nb.txt), nb.Wt, _ptr(nb.n_arr), _ptr(nb.peq), nb.A, nb.L,
        _ptr(nb.m_arr), None, None, None, None, 0, None, None, n,
        k, _ptr(k_arr), ctypes.c_int32(2), None, None, None, 0,
        _ptr(out_best), _ptr(nb._scr_pv), _ptr(nb._scr_mv), _ptr(nb._scr_bs))
    return out_best.copy()

a = run(libs["old"]); b = run(libs["new"])
assert (a==b).all(), "MISMATCH"
best = {"old":1e9, "new":1e9}
for rep in range(8):
    for name in ("old","new") if rep%2==0 else ("new","old"):
        t0=time.time(); run(libs[name]); dt=time.time()-t0
        best[name]=min(best[name],dt)
print(f"tlen={tlen} k={k} {mix}: old {best['old']*1e3:.2f}ms ({n/best['old']/1e3:.1f}k/s)  new {best['new']*1e3:.2f}ms ({n/best['new']/1e3:.1f}k/s)  ratio {best['old']/best['new']:.3f}")
