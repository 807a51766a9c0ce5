"""DTOC3 fingerprint scan -- the oracle run behind tools/maros_sif.py dtoc3().
Each candidate is an equality-constrained QP solved by one sparse KKT
factorization (f64 is ample: the dynamics are contractive, cond modest).
"""
import numpy as np, itertools, time
import scipy.sparse as sp, scipy.sparse.linalg as spla
T=5000; PUB=2.3526248e2

def solve(s, w, dyn_sign, y0, ctrl_in=2, include_first=False):
    # osc family: y1' = y1 + s*y2 ; y2' = y2 + dyn_sign*s*y1 (+ s*x if ctrl_in==2)
    # if ctrl_in==1 control enters eq1 instead
    n=3*T-1
    iy1=lambda t: t-1; iy2=lambda t: T+t-1; ix=lambda t: 2*T+t-1
    diag=np.zeros(n)
    lo = 1 if include_first else 2
    for t in range(lo,T+1):
        diag[iy1(t)]=s*w[0]; diag[iy2(t)]=s*w[1]
    for t in range(1,T): diag[ix(t)]=s*w[2]
    rows,cols,vals,b=[],[],[],[]; r=0
    for t in range(1,T):
        c1=[iy1(t+1),iy1(t),iy2(t)]; v1=[1.0,-1.0,-s]
        if ctrl_in==1: c1.append(ix(t)); v1.append(-s)
        rows+=[r]*len(c1); cols+=c1; vals+=v1; b.append(0.0); r+=1
        c2=[iy2(t+1),iy2(t),iy1(t)]; v2=[1.0,-1.0,-dyn_sign*s]
        if ctrl_in==2: c2.append(ix(t)); v2.append(-s)
        rows+=[r]*len(c2); cols+=c2; vals+=v2; b.append(0.0); r+=1
    rows+=[r]; cols+=[iy1(1)]; vals+=[1.0]; b.append(y0[0]); r+=1
    rows+=[r]; cols+=[iy2(1)]; vals+=[1.0]; b.append(y0[1]); r+=1
    A=sp.coo_matrix((vals,(rows,cols)),shape=(r,n)).tocsc()
    KKT=sp.bmat([[sp.diags(2.0*diag),A.T],[A,None]],format='csc')
    sol=spla.spsolve(KKT,np.concatenate([np.zeros(n),np.array(b)]))
    z=sol[:n]
    return float(diag@(z*z))

best=[]
for s in (1.0/T, 1.0/(T-1), 1.0/(T+1), 2.0/T):
    for w in itertools.product((0.5,1,2,3,6),repeat=3):
        for ds in (+1,-1):
            for y0 in ((15.,5.),(5.,15.)):
                for ci in (1,2):
                    o=solve(s,w,ds,y0,ci)
                    rel=abs(o-PUB)/PUB
                    if rel<0.02:
                        print(f'*** s={s:.6g} w={w} ds={ds} y0={y0} ci={ci}: obj={o:.7f} rel={rel:.2e}',flush=True)
                    best.append((rel,s,w,ds,y0,ci,o))
best.sort()
for b in best[:8]: print(b)

# Scan outcome (recorded): the unique exact hit is
#   s=1/5000, w=(1, 0.5, 3), ds=-1, y0=(15, 5), ctrl_in=2
#   -> obj = 235.26248103 (published 235.26248, rel 4.4e-9);
# i.e. obj = (s/2) sum(2 y1^2 + y2^2 + 6 x^2) with oscillator dynamics
# y1' = y1 + s y2, y2' = y2 - s y1 + s x — Coleman-Liao problem 3.
# The nearest competing variant misses by 5e-5; all others by >=1.7e-4.
