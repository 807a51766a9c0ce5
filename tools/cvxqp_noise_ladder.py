import sys
sys.path.insert(0, "/root/repo")
exec(open('tools/cvxqp_bisect.py').read().split('base = run')[0])

def run_noise(level, iters=100):
    x = np.zeros(nv); z = np.zeros(m); y = np.zeros(m)
    for k in range(1, iters+1):
        rhs_x = sigma*x - q
        rhs_z = z - (1.0/rho_vec)*y
        t = rhs_x + A.T @ (rho_vec*rhs_z)
        xt = sla.lu_solve(lu, t)
        if level:
            xt = xt + level*np.abs(xt).max()*np.random.default_rng(k).standard_normal(nv)
        zt = A @ xt
        x = alpha*xt + (1-alpha)*x
        zr = alpha*zt + (1-alpha)*z
        v = zr + (1.0/rho_vec)*y
        z = np.clip(v, l, u)
        y = y + rho_vec*(zr - z)
    dua_vec = q + P @ x + A.T @ y
    return cinv*np.abs(Dinv*dua_vec).max()

for lvl in (0, 1e-9, 1e-8, 1e-7, 1e-6, 3e-6):
    print(f"solve noise {lvl:.0e}: dua@100 = {run_noise(lvl):.3e}")
