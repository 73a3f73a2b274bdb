#!/usr/bin/env python3
"""Golden-value generator for graft.queries.EdgeBranchSpec.

Computes ~22 classical statistics from TEXTBOOK formulas (pure python,
no numpy/scipy) over the tiny literal fixtures the spec writes as
parquet. The constants printed here are hard-coded in EdgeBranchSpec —
an INDEPENDENT derivation, so a shared Spark/DuckDB formula error
(like round 11's Kruskal-Wallis -3(N+1) double subtraction) fails the
suite even when the mirrored-expression oracle is hash-green.

Run: python3 tools/golden_stats.py
"""
import math

HOUR = 3_600_000_000
DAY = 86_400_000_000


def r6(x):
    # round-half-even like Spark/DuckDB round() on doubles at 6dp is
    # actually half-up for positives in Spark; values are checked to be
    # far from boundaries below, so either convention agrees.
    return round(x, 6)


def check_far(name, x, dp=6):
    """Warn when a raw value sits near a rounding boundary."""
    scaled = x * 10 ** dp
    frac = abs(scaled - round(scaled))
    if abs(frac - 0.5) < 1e-3:
        print(f"  !! {name}: {x!r} is near a {dp}dp boundary")


def avg_ranks(values):
    """Average (midrank) ranks, 1-based, for a list with ties."""
    s = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and values[s[j + 1]] == values[s[i]]:
            j += 1
        r = (i + 1 + j + 1) / 2.0
        for k in range(i, j + 1):
            ranks[s[k]] = r
        i = j + 1
    return ranks


def mean(xs):
    return sum(xs) / len(xs)


def var_samp(xs):
    m = mean(xs)
    return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)


def median(xs):
    s = sorted(xs)
    n = len(s)
    return (s[(n - 1) // 2] + s[n // 2]) / 2.0


def arm_is_zero(uid):
    """Replicates graft's arithHash A/B split: arm 0 (A) iff
    ((uid % 1e6) * 2654435761 + 13) % 1e6 < 5e5."""
    return ((uid % 1_000_000) * 2654435761 + 13) % 1_000_000 < 500_000


# ---------------------------------------------------------------- KW
def kruskal(groups):
    """Textbook Kruskal-Wallis: H = 12/(N(N+1)) * sum n_g (rbar - (N+1)/2)^2
    with midranks; tie correction divides by 1 - sum(t^3-t)/(N^3-N)."""
    flat = [v for g in groups for v in g]
    n = len(flat)
    ranks = avg_ranks(flat)
    h = 0.0
    i = 0
    for g in groups:
        rg = ranks[i:i + len(g)]
        i += len(g)
        h += len(g) * (mean(rg) - (n + 1) / 2.0) ** 2
    h *= 12.0 / (n * (n + 1))
    from collections import Counter
    ties = Counter(flat)
    cf = 1.0 - sum(t ** 3 - t for t in ties.values()) / float(n ** 3 - n)
    return h, h / cf


KW0 = [[1.0, 2.0], [3.0, 4.0]]
KW1 = [[1.0, 2.0, 4.0], [3.0, 4.0, 6.0], [5.0, 7.0]]

# ------------------------------------------------------------- ANOVA
AOV = [[1.0, 2.0, 3.0, 4.0], [2.0, 4.0, 6.0, 8.0, 10.0], [5.0, 5.0, 6.0, 8.0]]


def anova(groups):
    flat = [v for g in groups for v in g]
    gm = mean(flat)
    ssb = sum(len(g) * (mean(g) - gm) ** 2 for g in groups)
    ssw = sum((v - mean(g)) ** 2 for g in groups for v in g)
    k, n = len(groups), len(flat)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    return ssb, ssw, f


def bartlett(groups):
    k = len(groups)
    n = sum(len(g) for g in groups)
    s2 = [var_samp(g) for g in groups]
    sp2 = sum((len(g) - 1) * s2i for g, s2i in zip(groups, s2)) / (n - k)
    m = (n - k) * math.log(sp2) - sum(
        (len(g) - 1) * math.log(s2i) for g, s2i in zip(groups, s2))
    c = 1.0 + (sum(1.0 / (len(g) - 1) for g in groups) - 1.0 / (n - k)) \
        / (3.0 * (k - 1))
    return sp2, m, c, m / c


# ------------------------------------------------- hourly count series
T1 = [5, 3, 8, 7, 7, 4, 9, 6, 6, 11]   # type t1, hours 100..109
T2 = [2, 2, 4, 4, 6, 6, 8, 8, 10, 3]   # type t2, hours 100..109


def grubbs(xs):
    m, s = mean(xs), math.sqrt(var_samp(xs))
    d = [abs(x - m) for x in xs]
    g = max(d) / s
    idx = d.index(max(d))  # first max = earliest hour (engine tie-break)
    return idx, xs[idx], g


def jarque_bera(xs):
    n, m = len(xs), mean(xs)
    m2 = sum((x - m) ** 2 for x in xs) / n
    m3 = sum((x - m) ** 3 for x in xs) / n
    m4 = sum((x - m) ** 4 for x in xs) / n
    sk = m3 / m2 ** 1.5
    ku = m4 / m2 ** 2 - 3.0
    jb = n / 6.0 * (sk ** 2 + ku ** 2 / 4.0)
    return sk, ku, jb


def ljung_box(xs, maxlag=6):
    n, m = len(xs), mean(xs)
    den = sum((x - m) ** 2 for x in xs)
    out = []
    q = 0.0
    for k in range(1, maxlag + 1):
        num = sum((xs[t] - m) * (xs[t - k] - m) for t in range(k, n))
        r = num / den
        q += r * r / (n - k)
        out.append((k, r, n * (n + 2) * q))
    return out


def mann_kendall(xs):
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n) for j in range(i + 1, n))
    from collections import Counter
    ties = Counter(xs)
    var = (n * (n - 1) * (2 * n + 5)
           - sum(t * (t - 1) * (2 * t + 5) for t in ties.values())) / 18.0
    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    return s, var, z


def levene_bf(groups):
    """Brown-Forsythe: one-way F over |x - median_g|."""
    z = [[abs(x - median(g)) for x in g] for g in groups]
    return anova(z)[2]


def mood_median(groups):
    flat = [v for g in groups for v in g]
    gm = median(flat)
    cells = [(sum(1 for x in g if x > gm), sum(1 for x in g if x < gm))
             for g in groups]
    ta = sum(a for a, _ in cells)
    tb = sum(b for _, b in cells)
    n = ta + tb
    chi2 = 0.0
    for a, b in cells:
        ea = (a + b) * ta / n
        eb = (a + b) * tb / n
        if ea > 0:
            chi2 += (a - ea) ** 2 / ea
        if eb > 0:
            chi2 += (b - eb) ** 2 / eb
    return n, chi2


# --------------------------------------------------------- Friedman
FRIED = {  # counts[type][day], days 0..4
    "A": [1, 2, 3, 4, 5],
    "B": [2, 1, 4, 3, 6],
    "C": [2, 3, 1, 5, 4],
}


def friedman(matrix):
    types = sorted(matrix)
    ndays = len(next(iter(matrix.values())))
    rank_sums = {t: 0.0 for t in types}
    for d in range(ndays):
        vals = [matrix[t][d] for t in types]
        rk = avg_ranks(vals)
        for t, r in zip(types, rk):
            rank_sums[t] += r
    k, nb = len(types), ndays
    sq = sum(r ** 2 for r in rank_sums.values())
    q = 12.0 * sq / (nb * k * (k + 1)) - 3.0 * nb * (k + 1)
    return rank_sums, q


# ----------------------------------------------------- Kendall tau-b
KA = [3, 1, 4, 1, 5, 9, 2, 6]   # view counts, hours 200..207
KB = [2, 7, 1, 8, 2, 8, 1, 8]   # click counts


def kendall_tau_b(a, b):
    n = len(a)
    nc = nd = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (a[j] - a[i]) * (b[j] - b[i])
            if s > 0:
                nc += 1
            elif s < 0:
                nd += 1
    n0 = n * (n - 1) // 2
    from collections import Counter
    n1 = sum(c * (c - 1) // 2 for c in Counter(a).values())
    n2 = sum(c * (c - 1) // 2 for c in Counter(b).values())
    tau = (nc - nd) / math.sqrt((n0 - n1) * (n0 - n2))
    return nc, nd, n1, n2, tau


# -------------------------------------------------------- Spearman
SP_TOD = [1, 2, 3, 4, 5, 6, 7, 8]          # tod hour (ascending)
SP_VAL = [3.0, 1.0, 4.0, 10.0, 5.0, 9.0, 2.0, 6.0]


def spearman_noties(tod, val):
    n = len(val)
    rv = avg_ranks(val)
    rt = avg_ranks(tod)
    d2 = sum((a - b) ** 2 for a, b in zip(rv, rt))
    return 1.0 - 6.0 * d2 / (n * (n * n - 1))


# ------------------------------------------------------------- CvM
CVM_C = [8640000000, 17280000000, 34560000000, 60480000000, 77760000000]
CVM_D = [21600000000, 21600000000, 43200000000, 64800000000]  # tie


def cvm_uniform(micros):
    u = sorted(m / 86400000000 for m in micros)
    n = len(u)
    return 1.0 / (12 * n) + sum(
        (ui - (2 * (i + 1) - 1) / (2.0 * n)) ** 2 for i, ui in enumerate(u))


# ------------------------------------------------ Welch t / MW per arm
AB_A = [10.0, 12.0, 14.0, 16.0, 18.0]   # arm A (variant 0) values
AB_B = [11.0, 14.0, 19.0, 23.0, 27.0]   # arm B values (14 ties with A)


def welch_t(a, b):
    return (mean(b) - mean(a)) / math.sqrt(
        var_samp(a) / len(a) + var_samp(b) / len(b))


def mann_whitney(a, b):
    flat = a + b
    ranks = avg_ranks(flat)
    ra = sum(ranks[:len(a)])
    na, nb = len(a), len(b)
    n = na + nb
    ua = ra - na * (na + 1) / 2.0
    from collections import Counter
    tie3 = sum(t ** 3 - t for t in Counter(flat).values())
    sigma = math.sqrt(na * nb / 12.0 * ((n + 1) - tie3 / (n * (n - 1))))
    z = (ua - na * nb / 2.0) / sigma
    return ua, z


# --------------------------------------------------- two-proportion z
ZT_N1, ZT_X1 = 6, 2   # first shipdate half: 2 R of 6
ZT_N2, ZT_X2 = 6, 4


def two_prop_z(n1, x1, n2, x2):
    p1, p2 = x1 / n1, x2 / n2
    pp = (x1 + x2) / (n1 + n2)
    return p1, p2, (p1 - p2) / math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))


# ------------------------------------------------- Cochran-Armitage
CA = [(0, 10, 1), (1, 10, 2), (2, 10, 4), (3, 10, 6)]  # (score, n, successes)


def cochran_armitage(cells):
    rows = [(s, y) for s, n, x in cells for y in
            [1] * x + [0] * (n - x)]
    n = len(rows)
    rr = sum(y for _, y in rows)
    sn = sum(s for s, _ in rows)
    sr = sum(s * y for s, y in rows)
    s2n = sum(s * s for s, _ in rows)
    num = n * sr - rr * sn
    z = num * math.sqrt(n) / math.sqrt(rr * (n - rr) * (n * s2n - sn * sn))
    return n, rr, z


# ------------------------------------------------------------- CMH
CMH = [(3, 5, 2, 6), (2, 6, 3, 5), (4, 4, 1, 7)]   # (a,b,c,d) per day


def cmh(cells):
    num = sum(a * d / (a + b + c + d) for a, b, c, d in cells)
    den = sum(b * c / (a + b + c + d) for a, b, c, d in cells)
    ta = sum(a for a, _, _, _ in cells)
    tb = sum(b for _, b, _, _ in cells)
    tc = sum(c for _, _, c, _ in cells)
    td = sum(d for _, _, _, d in cells)
    return num / den, ta * td / (tb * tc)


# --------------------------------------------------------- log-rank
# (uid, first_day, last_day); engine: k = last-first days, censored iff
# last_us >= h_end - DAY with h_end = max ts over ALL events.
LR_USERS = [
    (101, 0, 2), (102, 0, 1), (103, 0, 3), (104, 1, 3),
    (105, 0, 9), (106, 2, 9), (107, 1, 2), (108, 3, 5),
    (109, 0, 0), (110, 4, 9),
]


def logrank(users):
    # replicate the engine's lifetime derivation exactly (ts = day*DAY
    # + 1000*uid), then the TEXTBOOK hypergeometric E/V sums.
    evs = [(d * DAY + 1000 * u) for u, f, l in users for d in (f, l)]
    h_end = max(evs)
    life = []
    for u, f, l in users:
        first, last = f * DAY + 1000 * u, l * DAY + 1000 * u
        k = (last - first) // DAY
        censored = last >= h_end - DAY
        life.append((u, k, censored, 0 if arm_is_zero(u) else 1))
    death_days = sorted({k for _, k, c, _ in life if not c})
    o1 = e1 = v = 0.0
    for dk in death_days:
        at = [(u, k, c, a) for u, k, c, a in life if k >= dk]
        n = len(at)
        n1 = sum(1 for _, _, _, a in at if a == 0)
        d = sum(1 for _, k, c, _ in at if k == dk and not c)
        d1 = sum(1 for _, k, c, a in at if k == dk and not c and a == 0)
        o1 += d1
        e1 += d * n1 / n
        if n > 1:
            v += d * n1 * (n - n1) * (n - d) / (n * n * (n - 1))
    z = (o1 - e1) / math.sqrt(v)
    return len(death_days), o1, e1, v, z, life


# ------------------------------------- raters: fleiss / AC1 / alpha
# (ra, rb, rc) per doc — the spec controls them via n_chars / texts.
RATERS = [
    (1, 1, 1), (1, 1, 0), (1, 0, 1), (1, 0, 0),
    (0, 1, 1), (0, 1, 0), (0, 0, 1), (0, 0, 0), (1, 1, 1),
]


def fleiss(rows):
    n, m = len(rows), 3
    t1 = sum(sum(r) for r in rows)
    t0 = n * m - t1
    p1, p0 = t1 / (n * m), t0 / (n * m)
    pbar = sum(
        (sum(r) ** 2 + (m - sum(r)) ** 2 - m) / (m * (m - 1.0)) for r in rows) / n
    pe = p1 ** 2 + p0 ** 2
    return pbar, pe, (pbar - pe) / (1 - pe)


def gwet_ac1(rows):
    n, m = len(rows), 3
    t1 = sum(sum(r) for r in rows)
    pa = sum(
        (sum(r) ** 2 + (m - sum(r)) ** 2 - m) / (m * (m - 1.0)) for r in rows) / n
    pi = t1 / (n * m)
    pe = 2 * pi * (1 - pi)
    return pa, pe, (pa - pe) / (1 - pe)


def cronbach(rows):
    n, k = len(rows), 3
    items = [[r[i] for r in rows] for i in range(k)]
    tot = [sum(r) for r in rows]

    def vpop(xs):
        m = mean(xs)
        return sum((x - m) ** 2 for x in xs) / len(xs)

    vs = sum(vpop(it) for it in items)
    vt = vpop(tot)
    return vs, vt, k / (k - 1.0) * (1 - vs / vt)


def main():
    print("== arm assignment (arithHash seed 13) for uids 1..30 ==")
    arms = {u: ("A" if arm_is_zero(u) else "B") for u in range(1, 31)}
    print("  A:", [u for u, a in arms.items() if a == "A"])
    print("  B:", [u for u, a in arms.items() if a == "B"])
    for u, _, _ in LR_USERS:
        pass
    print("  logrank uids:",
          {u: ("A" if arm_is_zero(u) else "B") for u, _, _ in LR_USERS})

    h0, ha0 = kruskal(KW0)
    print(f"\nkw0: h={r6(h0)} h_adj={r6(ha0)}  raw={h0!r}")
    h1, ha1 = kruskal(KW1)
    print(f"kw1: h={r6(h1)} h_adj={r6(ha1)}  raw=({h1!r},{ha1!r})")
    check_far("kw1.h", h1); check_far("kw1.h_adj", ha1)

    ssb, ssw, f = anova(AOV)
    print(f"\naov: ss_between={r6(ssb)} ss_within={r6(ssw)} f={r6(f)}  rawf={f!r}")
    check_far("aov.f", f)
    sp2, m, c, b = bartlett(AOV)
    print(f"bartlett: pooled_var={r6(sp2)} m={r6(m)} c={r6(c)} stat={r6(b)}  "
          f"raw=({m!r},{b!r})")
    check_far("bartlett.m", m); check_far("bartlett.stat", b)

    for name, xs in (("t1", T1), ("t2", T2)):
        i, xo, g = grubbs(xs)
        print(f"\ngrubbs[{name}]: outlier_h={100+i} x_out={xo} g={r6(g)}  raw={g!r}")
        check_far(f"grubbs.{name}", g)
        sk, ku, jb = jarque_bera(xs)
        print(f"jb[{name}]: skew={r6(sk)} exkurt={r6(ku)} jb={r6(jb)}  raw={jb!r}")
        check_far(f"jb.{name}", jb)
        lb = ljung_box(xs)
        print(f"ljungbox[{name}]: r1={r6(lb[0][1])} q6={r6(lb[5][2])}  "
              f"raw=({lb[0][1]!r},{lb[5][2]!r})")
        check_far(f"lb.{name}.q6", lb[5][2])
        s, var, z = mann_kendall(xs)
        print(f"mannkendall[{name}]: s={s} var_s={r6(var)} z={r6(z)}  raw={z!r}")
        check_far(f"mk.{name}.z", z)

    print(f"\nlevene w={r6(levene_bf([T1, T2]))}  raw={levene_bf([T1, T2])!r}")
    check_far("levene", levene_bf([T1, T2]))
    nu, chi2 = mood_median([T1, T2])
    print(f"mood: n_used={nu} chi2={r6(chi2)}  raw={chi2!r}")
    check_far("mood", chi2)

    rs, q = friedman(FRIED)
    print(f"\nfriedman: rank_sums={ {t: r for t, r in rs.items()} } q={r6(q)}  raw={q!r}")
    check_far("friedman.q", q)

    nc, nd, n1, n2, tau = kendall_tau_b(KA, KB)
    print(f"\nkendall: nc={nc} nd={nd} ties_a={n1} ties_b={n2} tau_b={r6(tau)}  raw={tau!r}")
    check_far("kendall", tau)

    rho = spearman_noties(SP_TOD, SP_VAL)
    print(f"spearman: rho={r6(rho)}  raw={rho!r}")
    check_far("spearman", rho)

    print(f"\ncvm c: w2={r6(cvm_uniform(CVM_C))}  raw={cvm_uniform(CVM_C)!r}")
    print(f"cvm d: w2={r6(cvm_uniform(CVM_D))}  raw={cvm_uniform(CVM_D)!r}")
    check_far("cvm.c", cvm_uniform(CVM_C)); check_far("cvm.d", cvm_uniform(CVM_D))

    t = welch_t(AB_A, AB_B)
    print(f"\nwelch: mean_a={r6(mean(AB_A))} mean_b={r6(mean(AB_B))} t={r6(t)}  raw={t!r}")
    check_far("welch", t)
    ua, z = mann_whitney(AB_A, AB_B)
    print(f"mannwhitney: u_a={ua} z={r6(z)}  raw={z!r}")
    check_far("mw.z", z)

    p1, p2, z = two_prop_z(ZT_N1, ZT_X1, ZT_N2, ZT_X2)
    print(f"\nzprop: p1={r6(p1)} p2={r6(p2)} z={r6(z)}  raw={z!r}")
    check_far("zprop", z)

    n, rr, z = cochran_armitage(CA)
    print(f"ca: n={n} succ={rr} z={r6(z)}  raw={z!r}")
    check_far("ca", z)

    orm, orc = cmh(CMH)
    print(f"cmh: or_mh={r6(orm)} or_crude={r6(orc)}  raw=({orm!r},{orc!r})")
    check_far("cmh.mh", orm); check_far("cmh.crude", orc)

    ndd, o1, e1, v, z, life = logrank(LR_USERS)
    print(f"\nlogrank: n_death_days={ndd} o1={o1} e1={r6(e1)} v={r6(v)} z={r6(z)}")
    print(f"  raw=({e1!r},{v!r},{z!r})  life={life}")
    check_far("logrank.e1", e1); check_far("logrank.v", v); check_far("logrank.z", z)

    pb, pe, kap = fleiss(RATERS)
    print(f"\nfleiss: p_bar={r6(pb)} p_e={r6(pe)} kappa={r6(kap)}  raw={kap!r}")
    check_far("fleiss", kap)
    pa, peg, ac1 = gwet_ac1(RATERS)
    print(f"gwet: p_a={r6(pa)} p_e={r6(peg)} ac1={r6(ac1)}  raw={ac1!r}")
    check_far("gwet", ac1)
    vs, vt, al = cronbach(RATERS)
    print(f"alpha: var_items={r6(vs)} var_total={r6(vt)} alpha={r6(al)}  raw={al!r}")
    check_far("alpha", al)

    # SPRT: ln(1.1), ln(0.9) walk; boundaries +-ln(19), 9dp rounding.
    hi = round(math.log(19), 9)
    l1, l0 = math.log(1.1), math.log(0.9)
    print(f"\nsprt: hi={hi!r} ln1.1={l1!r} ln0.9={l0!r}")
    for t in (30, 31):
        print(f"  t={t}: llr={round(t * l1, 9)!r} crosses={round(t * l1, 9) >= hi}")
    # alternating walk of 6: x=1,0,1,0,1,0
    llr = round(3 * l1 + 3 * l0, 9)
    print(f"  alternating-6 final llr={llr!r} round6={r6(llr)}")


if __name__ == "__main__":
    main()


# ======================================================== tranche 2

def tranche2():
    print("\n===== tranche 2 =====")

    # drift_ks / drift_psi: type "k", early values at hours 0..4,
    # late values at hours 10..14 (mid = 7h splits them).
    A = [1.0, 2.0, 3.0, 4.0, 5.0]
    B = [3.0, 4.0, 5.0, 6.0, 7.0]

    def cdf(xs, v):
        return sum(1 for x in xs if x <= v) / len(xs)
    ks = max(abs(cdf(A, v) - cdf(B, v)) for v in sorted(set(A + B)))
    print(f"drift_ks: ks={r6(ks)}")

    mn, mx = min(A + B), max(A + B)
    bins = 10

    def binof(v):
        return min(int((v - mn) * bins // (mx - mn)), bins - 1)
    ca = [0] * bins
    cb = [0] * bins
    for v in A:
        ca[binof(v)] += 1
    for v in B:
        cb[binof(v)] += 1
    psi = 0.0
    for i in range(bins):
        pa = (ca[i] + 0.5) / (len(A) + bins * 0.5)
        pb = (cb[i] + 0.5) / (len(B) + bins * 0.5)
        psi += (pa - pb) * math.log(pa / pb)
    print(f"drift_psi: psi={r6(psi)}  raw={psi!r}")
    check_far("psi", psi)

    # anomaly_fdr / anomaly_holm: type t1 hourly counts, one spike.
    AN = [1, 1, 1, 1, 1, 1, 1, 1, 1, 6]
    mu = mean(AN)
    sd = math.sqrt(sum((x - mu) ** 2 for x in AN) / len(AN))
    zs = [round((x - mu) / sd, 6) for x in AN]
    ps = [round(math.exp(-0.717 * abs(z) - 0.416 * z * z), 9) for z in zs]
    m = len(AN)
    order = sorted(range(m), key=lambda i: (ps[i], i))  # hour asc tiebreak
    print(f"anomaly: mu={mu} sd={sd!r} z_spike={zs[-1]} p_spike={ps[-1]!r}"
          f" p_flat={ps[0]!r}")
    bh = [i + 1 for i, idx in enumerate(order)
          if ps[idx] <= (i + 1) / (10.0 * m)]
    kmax = max(bh) if bh else 0
    print(f"  BH rows (i<=kmax): {kmax}")
    holm_stop = m + 1
    for i, idx in enumerate(order):
        if not (ps[idx] * (m - (i + 1) + 1) <= 0.1):
            holm_stop = i + 1
            break
    print(f"  Holm rows (i<kstop): {holm_stop - 1}")

    # ab_effect_size / ab_power on the tranche-1 AB fixture.
    a, b = AB_A, AB_B
    na, nb = len(a), len(b)
    ssa = sum((x - mean(a)) ** 2 for x in a)
    ssb = sum((x - mean(b)) ** 2 for x in b)
    sp = math.sqrt((ssa + ssb) / (na + nb - 2))
    d = (mean(b) - mean(a)) / sp
    g = d * (1 - 3.0 / (4 * (na + nb - 2) - 1))
    print(f"effect_size: mean_diff={r6(mean(b)-mean(a))} d={r6(d)} g={r6(g)}"
          f"  raw=({d!r},{g!r})")
    check_far("cohens_d", d); check_far("hedges_g", g)
    zsum = 2.8015852181129683
    se = math.sqrt(var_samp(a) / na + var_samp(b) / nb)
    print(f"ab_power: mde_abs={r6(zsum*se)} mde_rel={r6(zsum*se/mean(a))}"
          f"  raw=({zsum*se!r},{zsum*se/mean(a)!r})")
    check_far("mde_abs", zsum * se); check_far("mde_rel", zsum * se / mean(a))

    # survival_km / survival_na from the logrank life table.
    _, _, _, _, _, life = logrank(LR_USERS)
    death_days = sorted({k for _, k, c, _ in life if not c})
    surv, haz = 1.0, 0.0
    for dk in death_days:
        n = sum(1 for _, k, _, _ in life if k >= dk)
        dd = sum(1 for _, k, c, _ in life if k == dk and not c)
        surv *= 1 - dd / n
        haz += dd / n
        print(f"survival day={dk}: n_risk={n} d={dd} km={r6(surv)} na={r6(haz)}"
              f"  raw=({surv!r},{haz!r})")
        check_far(f"km.{dk}", surv); check_far(f"na.{dk}", haz)

    # events_dispersion over T1/T2 hourly counts.
    for name, xs in (("t1", T1), ("t2", T2)):
        mu = mean(xs)
        vp = sum((x - mu) ** 2 for x in xs) / len(xs)
        print(f"dispersion[{name}]: mean={r6(mu)} var={r6(vp)} D={r6(vp/mu)}"
              f" chi2={r6((len(xs)-1)*vp/mu)}  raw={(len(xs)-1)*vp/mu!r}")
        check_far(f"disp.{name}", (len(xs) - 1) * vp / mu)

    # events_entropy_rate: one user, sequence A,A,B,A,B,B.
    seq = ["A", "A", "B", "A", "B", "B"]
    trans = list(zip(seq, seq[1:]))
    from collections import Counter
    nij = Counter(trans)
    ni = Counter(t[0] for t in trans)
    h = -sum(c * math.log(c / ni[f]) for (f, _), c in nij.items()) / len(trans)
    k = len(set(t[0] for t in trans))
    print(f"entropy_rate: n_trans={len(trans)} n_states={k} h={r6(h)} "
          f"max={r6(math.log(k))} eff={r6(h/math.log(k))}"
          f"  raw=({h!r},{h/math.log(k)!r})")
    check_far("entropy", h); check_far("eff", h / math.log(k))

    # revenue_gini: customer cents 100,200,300,400.
    xs = sorted([100, 200, 300, 400])
    n = len(xs)
    gini = (2 * sum((i + 1) * x for i, x in enumerate(xs))
            - (n + 1) * sum(xs)) / (n * sum(xs))
    print(f"gini: {r6(gini)}")

    # events_burstiness: gaps 10s, 20s, 30s.
    gaps = [10_000_000, 20_000_000, 30_000_000]
    mu = mean(gaps)
    sd = math.sqrt(sum((g - mu) ** 2 for g in gaps) / len(gaps))
    print(f"burstiness: mean={r6(mu)} sd={r6(sd)} B={r6((sd-mu)/(sd+mu))}"
          f"  raw=({sd!r},{(sd-mu)/(sd+mu)!r})")
    check_far("burst.sd", sd); check_far("burst.b", (sd - mu) / (sd + mu))

    # corpus_gtest: lang x source counts en:(4,1) de:(1,4).
    obs = {("en", "s1"): 4, ("en", "s2"): 1, ("de", "s1"): 1, ("de", "s2"): 4}
    nn = sum(obs.values())
    rt = Counter()
    ct = Counter()
    for (l, s), o in obs.items():
        rt[l] += o
        ct[s] += o
    gstat = 2 * sum(o * math.log(o * nn / (rt[l] * ct[s]))
                    for (l, s), o in obs.items())
    print(f"gtest: g={r6(gstat)} dof=1 n={nn}  raw={gstat!r}")
    check_far("gtest", gstat)

    # mcnemar: both=2 only_len=3 only_tok=1 neither=1.
    bl, c = 3, 1
    chi2 = (max(abs(bl - c) - 1, 0)) ** 2 / (bl + c)
    print(f"mcnemar: chi2={r6(chi2)}")

    # cramers_v: types X/Y over dow 4/5 with counts 8/2 and 2/8.
    o = {("X", 4): 8, ("X", 5): 2, ("Y", 4): 2, ("Y", 5): 8}
    nn = 20
    rm = {"X": 10, "Y": 10}
    cm = {4: 10, 5: 10}
    chi2 = sum((nn * v - rm[t] * cm[dw]) ** 2 / (nn * rm[t] * cm[dw])
               for (t, dw), v in o.items())
    v = math.sqrt(chi2 / (nn * 1))
    print(f"cramers_v: chi2={r6(chi2)} v={r6(v)}")

    # ab_cuped: per-user (x_pre, y_post): uid1 A (10,20), uid3 A (20,30),
    # uid2 B (10,25), uid4 B (30,45).
    users = [(1, 10.0, 20.0), (3, 20.0, 30.0), (2, 10.0, 25.0),
             (4, 30.0, 45.0)]
    n = len(users)
    xs = [x for _, x, _ in users]
    ys = [y for _, _, y in users]
    covn = n * sum(x * y for _, x, y in users) - sum(xs) * sum(ys)
    varxn = n * sum(x * x for x in xs) - sum(xs) ** 2
    varyn = n * sum(y * y for y in ys) - sum(ys) ** 2
    theta = covn / varxn
    rho2 = covn * covn / (varxn * varyn)
    gx = mean(xs)
    for arm in ("a", "b"):
        sel = [(x, y) for u, x, y in users
               if (arm == "a") == arm_is_zero(u)]
        mx = mean([x for x, _ in sel])
        my = mean([y for _, y in sel])
        adj = my - theta * (mx - gx)
        print(f"cuped[{arm}]: n={len(sel)} mean_post={r6(my)} adj={r6(adj)}"
              f"  raw={adj!r}")
        check_far(f"cuped.{arm}", adj)
    print(f"cuped: theta={r6(theta)} rho2={r6(rho2)}"
          f"  raw=({theta!r},{rho2!r})")
    check_far("theta", theta); check_far("rho2", rho2)


if __name__ == "__main__":
    tranche2()


def tranche3():
    print("\n===== tranche 3 (new operators) =====")

    # kw_dunn on the KW1 fixture: pairwise Dunn z (tie-corrected).
    flat = [v for g in KW1 for v in g]
    n = len(flat)
    ranks = avg_ranks(flat)
    names = ["g1", "g2", "g3"]
    rbar, ng = {}, {}
    i = 0
    for nm, g in zip(names, KW1):
        rg = ranks[i:i + len(g)]
        i += len(g)
        rbar[nm] = mean(rg)
        ng[nm] = len(g)
    from collections import Counter
    tie3 = sum(t ** 3 - t for t in Counter(flat).values())
    sig2 = n * (n + 1) / 12.0 - tie3 / (12.0 * (n - 1))
    m = 3
    for a, b in [("g1", "g2"), ("g1", "g3"), ("g2", "g3")]:
        z = (rbar[a] - rbar[b]) / math.sqrt(sig2 * (1.0 / ng[a] + 1.0 / ng[b]))
        z6 = round(z, 6)
        p = round(math.exp(-0.717 * abs(z6) - 0.416 * z6 * z6), 9)
        print(f"dunn {a}-{b}: z={z6} p={p!r} sig={p*m <= 0.05}  rawz={z!r}")
        check_far(f"dunn.{a}{b}", z)

    # events_page_hinkley on T1/T2: PH = m_t - min m, m_t = sum(x - runmean).
    for nm, xs in (("t1", T1), ("t2", T2)):
        mvals, s = [], 0
        msum = 0.0
        for t, x in enumerate(xs, 1):
            s += x
            msum += x - s / t
            mvals.append(msum)
        ph = [mv - min(mvals[:i + 1]) for i, mv in enumerate(mvals)]
        mx = max(ph)
        arg = ph.index(mx)
        print(f"ph[{nm}]: ph_max={r6(mx)} argmax_h={100+arg} alarm={mx > 5}"
              f"  raw={mx!r}")
        check_far(f"ph.{nm}", mx)

    # events_wilcoxon: day0 hod counts [3,1,4,1,5], day1 [2,6,4,3,5].
    x = [3, 1, 4, 1, 5]
    y = [2, 6, 4, 3, 5]
    d = [b - a for a, b in zip(x, y) if b != a]
    ad = [abs(v) for v in d]
    rk = avg_ranks(ad)
    nn = len(d)
    wplus = sum(r for r, v in zip(rk, d) if v > 0)
    tie3 = sum(t ** 3 - t for t in Counter(ad).values())
    var = nn * (nn + 1) * (2 * nn + 1) / 24.0 - tie3 / 48.0
    z = (wplus - nn * (nn + 1) / 4.0) / math.sqrt(var)
    print(f"wilcoxon: n={nn} w_plus={wplus} z={r6(z)}  raw={z!r}")
    check_far("wilcoxon", z)

    # corpus_distinct_n: s1 docs "a b a b" + "a c".
    toks = [["a", "b", "a", "b"], ["a", "c"]]
    nt = sum(len(t) for t in toks)
    v1 = len({w for t in toks for w in t})
    bgs = [f"{t[i]} {t[i+1]}" for t in toks for i in range(len(t) - 1)]
    print(f"distinct_n: n_tokens={nt} v1={v1} d1={r6(v1/nt)} "
          f"n_bigrams={len(bgs)} v2={len(set(bgs))} "
          f"d2={r6(len(set(bgs))/len(bgs))}")


if __name__ == "__main__":
    tranche3()


def tranche4():
    print("\n===== tranche 4 =====")
    from collections import Counter

    # events_runs_test: values [1,9,9,1,1,9,1,9,9,1], median 5.
    vals = [1, 9, 9, 1, 1, 9, 1, 9, 9, 1]
    med = median(vals)
    sg = [1 if v > med else -1 for v in vals if v != med]
    runs = 1 + sum(1 for a, b in zip(sg, sg[1:]) if a != b)
    na = sum(1 for s in sg if s == 1)
    nb = len(sg) - na
    nn = na + nb
    mu = 2.0 * na * nb / nn + 1
    sig = math.sqrt(2.0 * na * nb * (2.0 * na * nb - nn)
                    / (nn * nn * (nn - 1.0)))
    z = (runs - mu) / sig
    print(f"runs_test: runs={runs} na={na} nb={nb} z={r6(z)}  raw={z!r}")
    check_far("runs", z)

    # events_theilsen: hourly counts [1,2,4,8].
    xs = [1, 2, 4, 8]
    slopes = sorted((xs[j] - xs[i]) / (j - i)
                    for i in range(4) for j in range(i + 1, 4))
    n = len(slopes)
    idx = 0.5 * (n - 1)
    lo, hi = slopes[int(idx)], slopes[int(idx) + 1]
    medsl = lo + (idx - int(idx)) * (hi - lo)
    print(f"theilsen: n_pairs={n} median_slope={r6(medsl)}  raw={medsl!r}")
    check_far("theilsen", medsl)

    # supplier_hhi: revenue cents 5000/3000/2000 in one nation.
    sh = [0.5, 0.3, 0.2]
    print(f"hhi: {r6(sum(s*s for s in sh))} top={max(sh)}")

    # palma_ratio: customer cents 100..1000.
    cents = [100 * i for i in range(1, 11)]
    cum = 0
    n = len(cents)
    tot = sum(cents)
    b40 = sum(sorted(cents)[: (4 * n) // 10])
    top10 = sum(sorted(cents)[n - n // 10:])
    print(f"palma: b40={b40} top10={top10} palma={r6(top10/b40)} "
          f"shares={r6(top10/tot)}/{r6(b40/tot)}")

    # vocab_chao1: token freqs a,b,c x1; d,e x2; f x3 (one doc).
    f1, f2, v, ntok = 3, 2, 6, 10
    chao1 = v + f1 * (f1 - 1) / (2.0 * (f2 + 1))
    print(f"chao1: v={v} f1={f1} f2={f2} chao1={r6(chao1)} "
          f"p_unseen={r6(f1/ntok)}")

    # lm_goodturing: bigram counts {x y:3, y x:2, p q:1}.
    # fof: N1=N2=N3=1; r* = (r+1)N_{r+1}/N_r; p0 = N1/total.
    # r* = (r+1) N_{r+1} / N_r (Good 1953 adjusted count)
    print("goodturing: r=1 r*=2.0, r=2 r*=3.0, r=3 r*=NULL, "
          f"p_unseen={r6(1/6)}")

    # spc_pchart: days (n, err): (20,2) (20,5) (20,1) (50,25).
    days = [(20, 2), (20, 5), (20, 1), (50, 25)]
    sn = sum(n for n, _ in days)
    sx = sum(x for _, x in days)
    pbar = sx / sn
    for i, (n, x) in enumerate(days):
        sig = math.sqrt(pbar * (1 - pbar) / n)
        ucl, lcl = pbar + 3 * sig, max(pbar - 3 * sig, 0.0)
        ooc = x / n > ucl or x / n < lcl
        print(f"pchart day{i}: p={r6(x/n)} pbar={r6(pbar)} ucl={r6(ucl)} "
              f"lcl={r6(lcl)} ooc={ooc}  rawucl={ucl!r}")
        check_far(f"pchart.{i}.ucl", ucl)

    # jackknife_days: day (n, sum_value): (2,10) (3,30) (1,5) (2,15).
    days = [(2, 10.0), (3, 30.0), (1, 5.0), (2, 15.0)]
    nn = sum(n for n, _ in days)
    ss = sum(v for _, v in days)
    d = len(days)
    # engine rounds each LOO mean to nano BEFORE the variance sum
    t = [round((ss - v) / (nn - n), 9) for n, v in days]
    tb = mean(t)
    se = math.sqrt((d - 1) / d * sum((x - tb) ** 2 for x in t))
    print(f"jackknife: mean={r6(ss/nn)} se={r6(se)}  raw={se!r}")
    check_far("jackknife", se)

    # shapley_attribution: users (mask, conv):
    # u1 click(1) conv, u2 view(8) no, u3 click+view(9) conv,
    # u4 signup(4) no.
    users = [(1, 1), (8, 0), (9, 1), (4, 0)]

    def v_of(S):
        sub = [(m, c) for m, c in users if (m & S) == m]
        return sum(c for _, c in sub) / len(sub) if sub else 0.0
    w = {0: 6 / 24.0, 1: 2 / 24.0, 2: 2 / 24.0, 3: 6 / 24.0}
    for name, bit in [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]:
        phi = 0.0
        for S in range(16):
            if S & bit:
                continue
            bc = bin(S).count("1")
            # engine rounds each weighted marginal to nano pre-sum
            phi += round(w[bc] * (v_of(S | bit) - v_of(S)), 9)
        print(f"shapley[{name}]: phi={r6(phi)}  raw={phi!r}")
        check_far(f"shapley.{name}", phi)


if __name__ == "__main__":
    tranche4()


def tranche5():
    print("\n===== tranche 5 =====")

    # population_estimate (Chapman): n1=3, n2=2, m=1, observed=4.
    n1, n2, m, obs = 3, 2, 1, 4
    chap = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    print(f"chapman: est={round(chap,2)} unseen={round(chap-obs,2)}")

    # price_index: part1 1995 (1000c,10) 1996 (1000c,5);
    # part2 1995 (2000c,10) 1996 (3000c,10).
    parts = [((1000, 10), (1000, 5)), ((2000, 10), (3000, 10))]
    v00 = sum(c0 for (c0, _), _ in parts)
    v11 = sum(c1 for _, (c1, _) in parts)
    v10 = sum(round(c1 * q0 / q1) for (c0, q0), (c1, q1) in parts)
    v01 = sum(round(c0 * q1 / q0) for (c0, q0), (c1, q1) in parts)
    lasp, paas = v10 / v00, v11 / v01
    print(f"price_index: laspeyres={r6(lasp)} paasche={r6(paas)} "
          f"fisher={r6(math.sqrt(lasp*paas))}  raw={math.sqrt(lasp*paas)!r}")
    check_far("fisher", math.sqrt(lasp * paas))

    # corpus_powerlaw: n_chars [50,100,200,400], xmin=100.
    xs = [100, 200, 400]
    alpha = 1 + len(xs) / sum(math.log(x / 100.0) for x in xs)
    print(f"powerlaw: n_used={len(xs)} alpha={r6(alpha)}  raw={alpha!r}")
    check_far("powerlaw", alpha)

    # ols_normal: cents = 1000 + 500*qty - 2*disc_bp exactly.
    print("ols_normal: b0=1000 b1=500 b2=-2 r2=1.0 (perfect fit)")

    # logistic_newton: rows (y, x): (0,0.1) (1,0.2) (0,0.3) (1,0.4);
    # replicate the 3 Newton iterations with nano-rounded aggregates.
    rows = [(0.0, 0.1), (1.0, 0.2), (0.0, 0.3), (1.0, 0.4)]
    w0 = w1 = 0.0
    for _ in range(3):
        g0 = sum(round((y - 1 / (1 + math.exp(-w0 - w1 * x))) * 1e9)
                 for y, x in rows) / 1e9
        g1 = sum(round((y - 1 / (1 + math.exp(-w0 - w1 * x))) * x * 1e9)
                 for y, x in rows) / 1e9
        h00 = sum(round((p := 1 / (1 + math.exp(-w0 - w1 * x))) * (1 - p) * 1e9)
                  for y, x in rows) / 1e9
        h01 = sum(round((p := 1 / (1 + math.exp(-w0 - w1 * x))) * (1 - p) * x * 1e9)
                  for y, x in rows) / 1e9
        h11 = sum(round((p := 1 / (1 + math.exp(-w0 - w1 * x))) * (1 - p) * x * x * 1e9)
                  for y, x in rows) / 1e9
        det = h00 * h11 - h01 * h01
        w0, w1 = (w0 + (g0 * h11 - g1 * h01) / det,
                  w1 + (h00 * g1 - h01 * g0) / det)
    sp = sum(round(1 / (1 + math.exp(-w0 - w1 * x)) * 1e9) for _, x in rows)
    print(f"logistic: w0={round(w0,6)} w1={round(w1,6)} "
          f"mean_p={r6(sp/1e9/4)}  raw=({w0!r},{w1!r})")
    check_far("log.w0", w0); check_far("log.w1", w1)

    # forecast_baseline: 58 hourly counts, one type.
    cnt = [(h % 24) + 1 for h in range(24)] + \
          [(h % 24) + 3 for h in range(24, 46)] + \
          [30, 28, 2, 3, 9, 4, 11, 6, 13, 8, 15, 10]
    assert len(cnt) == 58
    mn, mx = 0, 57
    hcut = mn + ((mx - mn + 1) * 8) // 10
    prof = {}
    for h in range(hcut):
        prof.setdefault(h % 24, []).append(cnt[h])
    sn = sp = 0
    ntest = 0
    for h in range(hcut, 58):
        if h - 24 < mn:
            continue
        hod = h % 24
        if hod not in prof:
            continue
        ntest += 1
        sn += abs(cnt[h] - cnt[h - 24]) * 1000000
        ps, pn = sum(prof[hod]), len(prof[hod])
        sp += round(abs(cnt[h] * pn - ps) * 1000000.0 / pn)
    print(f"forecast: hcut={hcut} n_test={ntest} "
          f"mae_naive={r6(sn/ntest/1e6)} mae_profile={r6(sp/ntest/1e6)} "
          f"mase={r6(sp/sn)}  raw={sp/sn!r}")
    check_far("mase", sp / sn)
    print("  counts:", cnt)


if __name__ == "__main__":
    tranche5()


def tranche6():
    print("\n===== tranche 6 =====")

    # anova_tukey on AOV: q_ij = (mi - mj)/sqrt(MSW/2 (1/ni + 1/nj)).
    ssb, ssw, _ = anova(AOV)
    n = sum(len(g) for g in AOV)
    k = len(AOV)
    msw = ssw / (n - k)
    names = ["a", "b", "c"]
    for i in range(3):
        for j in range(i + 1, 3):
            gi, gj = AOV[i], AOV[j]
            q = (mean(gi) - mean(gj)) / math.sqrt(
                msw / 2 * (1.0 / len(gi) + 1.0 / len(gj)))
            print(f"tukey {names[i]}-{names[j]}: diff={r6(mean(gi)-mean(gj))} "
                  f"q={r6(q)} sig={abs(round(q,6)) > 3.858}  raw={q!r}")
            check_far(f"tukey.{names[i]}{names[j]}", q)

    # ab_cliffs_delta on AB_A/AB_B: U_b = #(b>a) + ties/2.
    ub = sum((1.0 if b > a else 0.5 if b == a else 0.0)
             for a in AB_A for b in AB_B)
    nn = len(AB_A) * len(AB_B)
    delta = (2 * ub - nn) / nn
    print(f"cliffs: U_b={ub} delta={r6(delta)} cles={r6((delta+1)/2)}")


if __name__ == "__main__":
    tranche6()


def tranche7():
    print("\n===== tranche 7 =====")

    # events_durbin_watson on T1/T2.
    for nm, xs in (("t1", T1), ("t2", T2)):
        num = sum((b - a) ** 2 for a, b in zip(xs, xs[1:]))
        mu = mean(xs)
        den = sum((x - mu) ** 2 for x in xs)
        print(f"dw[{nm}]: dw={r6(num/den)}  raw={num/den!r}")
        check_far(f"dw.{nm}", num / den)

    # events_hurst: 64-hour series, engine R/S over m = 8,16,32.
    H64 = [((h * 7) % 13) + ((h * 3) % 5) + 1 for h in range(64)]
    pts = []
    for m in (8, 16, 32):
        rss = []
        for b in range(64 // m):
            blk = H64[b * m:(b + 1) * m]
            mu = mean(blk)
            cum, mx, mn, s = 0.0, -1e18, 1e18, 0.0
            cums = []
            for x in blk:
                cum += x - mu
                cums.append(cum)
            r = max(cums) - min(cums)
            sd = math.sqrt(sum((x - mu) ** 2 for x in blk) / m)
            if sd > 0:
                rss.append(r / sd)
        pts.append((math.log(m), math.log(mean(rss))))
    xb = mean([x for x, _ in pts])
    yb = mean([y for _, y in pts])
    slope = sum((x - xb) * (y - yb) for x, y in pts) / \
        sum((x - xb) ** 2 for x, _ in pts)
    print(f"hurst: {r6(slope)}  raw={slope!r}")
    check_far("hurst", slope)
    print("  H64 =", H64)

    # markov_attribution: 1 user, 2 sessions:
    # [view, click, purchase], [view] -> hand-solved chain:
    # P(start->conv) = 0.5; removing either channel kills it.
    print("markov_attr: base=0.5; view/click removed=0.0, effect=0.5, "
          "share=0.5 each")


if __name__ == "__main__":
    tranche7()


def tranche8():
    print("\n===== tranche 8: eval metrics =====")
    # interactions: (cust, part, score, qty); rel = qty > 25.
    inter = {
        1: [(1, 100.0, 30), (2, 100.0, 10), (3, 150.0, 40), (4, 80.0, 5)],
        2: [(1, 200.0, 30), (4, 300.0, 5)],
        3: [(5, 10.0, 30)],
    }
    # --- mean per-user AUC (midranks ascending by score)
    aucs = []
    for u, items in inter.items():
        scores = [s for _, s, _ in items]
        rel = [1 if q > 25 else 0 for _, _, q in items]
        rk = avg_ranks(scores)
        npos, nneg = sum(rel), len(rel) - sum(rel)
        if npos and nneg:
            rsum = sum(r for r, y in zip(rk, rel) if y)
            aucs.append((rsum - npos * (npos + 1) / 2) / (npos * nneg))
    print(f"auc: n_users={len(aucs)} mean={r6(mean(aucs))}  raw={mean(aucs)!r}")
    check_far("auc", mean(aucs))

    # --- P/R/F1/NDCG/MAP @ k (desc score, item asc; binary relevance)
    for k in (5, 10):
        ps, rs, f1s, ndcgs, maps_ = [], [], [], [], []
        for u, items in inter.items():
            order = sorted(items, key=lambda t: (-t[1], t[0]))[:k]
            relset = {i for i, _, q in items if q > 25}
            nrel = len(relset)
            hits = cum = 0
            dcg = apn = 0.0
            for pos, (i, _, _) in enumerate(order, 1):
                if i in relset:
                    hits += 1
                    cum += 1
                    dcg += 1 / math.log2(pos + 1)
                    apn += cum / pos
            m = min(nrel, k)
            idcg = sum(1 / math.log2(i + 1) for i in range(1, m + 1))
            p, r = hits / k, hits / nrel
            ps.append(p); rs.append(r)
            f1s.append(0.0 if hits == 0 else 2 * p * r / (p + r))
            ndcgs.append(dcg / idcg if idcg > 0 else 0.0)
            maps_.append(apn / m if m > 0 else 0.0)
        print(f"rank@{k}: P={r6(mean(ps))} R={r6(mean(rs))} F1={r6(mean(f1s))} "
              f"NDCG={r6(mean(ndcgs))} MAP={r6(mean(maps_))}")
        for nm, v in [("P", mean(ps)), ("F1", mean(f1s)), ("NDCG", mean(ndcgs)),
                      ("MAP", mean(maps_))]:
            check_far(f"rank{k}.{nm}", v)


if __name__ == "__main__":
    tranche8()


def tranche9():
    print("\n===== tranche 9: corpus stats =====")
    # source_simpson: s1 = "a a a b b c", s2 = "x x".
    for src, cnts in (("s1", [3, 2, 1]), ("s2", [2])):
        n = sum(cnts)
        num = sum(c * (c - 1) for c in cnts)
        v = 1 - num / (n * (n - 1))
        print(f"simpson[{src}]: n_types={len(cnts)} n={n} simpson={r6(v)}")

    # lang_entropy: en = {a:3,b:2,c:1}, de = {x:2}; corpus = union.
    corpus = {"a": 3, "b": 2, "c": 1, "x": 2}
    tot = sum(corpus.values())
    for lang, cnt in (("en", {"a": 3, "b": 2, "c": 1}), ("de", {"x": 2})):
        n = sum(cnt.values())
        ent = -sum(c / n * math.log(c / n) for c in cnt.values())
        kl = sum(c / n * math.log((c / n) / (corpus[t] / tot))
                 for t, c in cnt.items())
        print(f"entropy[{lang}]: n={n} H={r6(ent)} KL={r6(kl)}"
              f"  raw=({ent!r},{kl!r})")
        check_far(f"H.{lang}", ent); check_far(f"KL.{lang}", kl)

    # corpus_zipf: freqs 8,4,2,1 at ranks 1..4 (ln-ln least squares).
    pts = [(math.log(rk), math.log(n))
           for rk, n in ((1, 8), (2, 4), (3, 2), (4, 1))]
    xb = mean([x for x, _ in pts]); yb = mean([y for _, y in pts])
    sxy = sum((x - xb) * (y - yb) for x, y in pts)
    sxx = sum((x - xb) ** 2 for x, _ in pts)
    syy = sum((y - yb) ** 2 for _, y in pts)
    slope = sxy / sxx
    inter = yb - slope * xb
    r2 = sxy * sxy / (sxx * syy)
    print(f"zipf: slope={r6(slope)} intercept={r6(inter)} r2={r6(r2)}"
          f"  raw=({slope!r},{inter!r},{r2!r})")
    check_far("zipf.slope", slope); check_far("zipf.int", inter)
    check_far("zipf.r2", r2)


if __name__ == "__main__":
    tranche9()


def tranche10():
    print("\n===== tranche 10: croston =====")
    # one part, demand at weeks 0, 2, 3: sizes [4,6,10], intervals [1,2,1].
    sizes = [4, 6, 10]
    ivs = [1, 2, 1]
    a, T = 0.3, 3
    ws = [(1 - a) ** (T - 1)] + [a * (1 - a) ** (T - i) for i in (2, 3)]
    zh = sum(w * z for w, z in zip(ws, sizes))
    vh = sum(w * v for w, v in zip(ws, ivs))
    print(f"croston: w={ws} zh={r6(zh)} vh={r6(vh)} "
          f"croston={r6(zh/vh)} sba={r6(0.85*zh/vh)}"
          f"  raw=({zh/vh!r},{0.85*zh/vh!r})")
    check_far("croston", zh / vh); check_far("sba", 0.85 * zh / vh)


if __name__ == "__main__":
    tranche10()


def tranche11():
    print("\n===== tranche 11: pricing =====")
    # price_elasticity: q = 5 * (1-d)^-2 exactly -> elasticity -2.
    rows = [(0.0, 5.0), (0.5, 20.0), (0.2, 7.8125)]
    xs = [round(math.log(1 - d) * 1e9) for d, _ in rows]
    ys = [round(math.log(q) * 1e9) for _, q in rows]
    n = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n / 1e9
    print(f"elasticity: b={r6(b)} intercept={r6(a)}  raw=({b!r},{a!r})")
    check_far("elast.b", b); check_far("elast.a", a)

    # price_volume_mix: one part, (q0=10, c0=1000), (q1=20, c1=3000).
    q0, c0, q1, c1 = 10, 1000, 20, 3000
    p0, p1 = c0 / q0, c1 / q1
    print(f"pvm: delta={c1-c0} volume={round((q1-q0)*p0/100, 2)} "
          f"price={round(q1*(p1-p0)/100, 2)}")


if __name__ == "__main__":
    tranche11()


def tranche12():
    print("\n===== tranche 12: A/B closers, Benford, hash audit =====")
    # ab_srm: balanced 5/5 and imbalanced 7/1.
    for uids in ([1, 3, 5, 7, 8, 2, 4, 6, 9, 11], [1, 3, 5, 7, 8, 10, 12, 2]):
        na = sum(1 for u in uids if arm_is_zero(u))
        nb = len(uids) - na
        chi2 = (na - nb) ** 2 / (na + nb)
        z = (na - nb) / math.sqrt(na + nb)
        print(f"srm: n_a={na} n_b={nb} chi2={r6(chi2)} z={r6(z)} "
              f"flag={chi2 > 3.841459}  rawz={z!r}")
        check_far("srm.z", z)

    # ab_qte on the AB fixture: lower medians of milli-values.
    for nm, vals in (("a", AB_A), ("b", AB_B)):
        s = sorted(int(v * 1000) for v in vals)
        med = s[(len(s) + 1) // 2 - 1]
        print(f"qte[{nm}]: median={med/1e3}")

    # ab_permutation on the AB fixture (64 hash sign-flips).
    users = list(zip([1, 3, 5, 7, 8], AB_A)) + list(zip([2, 4, 6, 9, 11], AB_B))
    rows = [(u, int(round(v * 1e6))) for u, v in users]
    def arm0(u): return 0 if arm_is_zero(u) else 1
    sa0 = sum(v for u, v in rows if arm0(u) == 0)
    na0 = sum(1 for u, v in rows if arm0(u) == 0)
    sb0 = sum(v for u, v in rows if arm0(u) == 1)
    nb0 = len(rows) - na0
    a0 = sa0 * nb0 - sb0 * na0
    n_ge = 0
    for j in range(1, 65):
        def flip(u):
            return ((u % 1000000) * 2654435761 + j * 7919) % 1000000 < 500000
        arms = {u: (arm0(u) + (1 if flip(u) else 0)) % 2 for u, _ in rows}
        sa = sum(v for u, v in rows if arms[u] == 0)
        na = sum(1 for u, v in rows if arms[u] == 0)
        sb = sum(v for u, v in rows if arms[u] == 1)
        nb = len(rows) - na
        aj = sa * nb - sb * na
        if abs(aj) * (na0 * nb0) >= abs(a0) * (na * nb):
            n_ge += 1
    print(f"perm: n_a={na0} n_b={nb0} diff_obs={r6(a0/(na0*nb0)/1e6)} "
          f"n_ge={n_ge} p={r6((1+n_ge)/65.0)}  rawp={(1+n_ge)/65.0!r}")
    check_far("perm.p", (1 + n_ge) / 65.0)

    # benford_revenue: cents 100, 250, 3000, 111 -> digits 1,2,3,1.
    from collections import Counter
    digs = Counter([1, 2, 3, 1])
    tot = 4
    for d in sorted(digs):
        share = digs[d] / tot
        p = math.log10(1 + 1 / d)
        term = (share - p) ** 2 / p * tot
        print(f"benford d={d}: n={digs[d]} share={r6(share)} p={r6(p)} "
              f"chi2={r6(term)}  raw=({p!r},{term!r})")
        check_far(f"benford.{d}.p", p); check_far(f"benford.{d}.t", term)

    # hash_collision_audit: custkeys 1..50, md5-hex[:15] % 1024.
    import hashlib
    from collections import Counter as C2
    b = C2(int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % 1024
           for k in range(1, 51))
    obs = sum(c * (c - 1) // 2 for c in b.values())
    exp = 50 * 49 / 2 / 1024
    print(f"hash_audit: occupied={len(b)} max={max(b.values())} obs={obs} "
          f"exp={r6(exp)} ratio={r6(obs/exp)}  raw={obs/exp!r}")
    check_far("hash.ratio", obs / exp)


if __name__ == "__main__":
    tranche12()


def tranche13():
    print("\n===== tranche 13: BM25, DP Laplace =====")
    # bm25: docs "vector key dup" (dl 3), "vector vector other words
    # here" (dl 5), "nothing relevant at all stuff" (dl 5).
    N, avgdl = 3, 13 / 3
    df = {"vector": 2, "key": 1, "dup": 1}
    k1, bb = 1.2, 0.75

    def term_score(t, tf, dl):
        idf = math.log(1 + (N - df[t] + 0.5) / (df[t] + 0.5))
        return round(idf * tf * (k1 + 1) /
                     (tf + k1 * (1 - bb + bb * dl / avgdl)), 6)
    d1 = round(sum(term_score(t, 1, 3) for t in ("vector", "key", "dup")), 6)
    d2 = round(term_score("vector", 2, 5), 6)
    print(f"bm25 doc1: {d1}  doc2: {d2}")

    # dp_counts: noise = -10 sign(u-.5) ln(1-2|u-.5|), u from
    # md5('dp:'+type) first 15 hex digits.
    import hashlib
    for tpe, n in (("view", 2), ("click", 1)):
        h = int(hashlib.md5(f"dp:{tpe}".encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / 16 ** 15
        c = u - 0.5
        noise = round(-10.0 * math.copysign(1.0, c) * math.log(1 - 2 * abs(c)), 6)
        ndp = round(n + noise, 6)
        print(f"dp[{tpe}]: noise={noise} n_dp={ndp}  raw={n + noise!r}")
        check_far(f"dp.{tpe}", n + noise)


if __name__ == "__main__":
    tranche13()


def tranche14():
    print("\n===== tranche 14: Dirichlet QL =====")
    # Same 3-doc corpus as BM25; mu = 2000, query (vector, key, dup).
    docs = {1: {"vector": 1, "key": 1, "dup": 1},
            2: {"vector": 2, "other": 1, "words": 1, "here": 1},
            3: {"nothing": 1, "relevant": 1, "at": 1, "all": 1, "stuff": 1}}
    dl = {d: sum(c.values()) for d, c in docs.items()}
    ctot = sum(dl.values())
    cf = {"vector": 3, "key": 1, "dup": 1}
    mu = 2000.0
    for d in (1, 2, 3):
        snano = 0
        hits = 0
        for t in ("vector", "key", "dup"):
            tf = docs[d].get(t, 0)
            snano += round(math.log((tf + mu * cf[t] / ctot)
                                    / (dl[d] + mu)) * 1e9)
            hits += 1 if tf else 0
        print(f"ql doc{d}: score={r6(snano/1e9)} hits={hits}")


if __name__ == "__main__":
    tranche14()


def tranche15():
    print("\n===== tranche 15: series family =====")
    import hashlib

    # --- events_bollinger: one type, 26 hourly counts, trailing-24 bands.
    C26 = [5, 6, 5, 7, 6, 5, 6, 7, 5, 6, 5, 7, 6, 5, 6, 7,
           5, 6, 5, 7, 6, 5, 6, 7, 20, 6]
    nu = nl = 0
    last = None
    for i in range(23, len(C26)):
        w = C26[i - 23:i + 1]
        sw, sw2 = sum(w), sum(x * x for x in w)
        dev = 24 * C26[i] - sw
        band = 2 * math.sqrt((24 * sw2 - sw * sw) * 24 / 23)
        if dev > band: nu += 1
        if dev < -band: nl += 1
        if abs(dev) > band: last = i
        print(f"  boll i={i} x={C26[i]} dev={dev} band={band:.4f}")
    print(f"bollinger: n_windows={len(C26)-23} n_upper={nu} n_lower={nl} "
          f"last_breakout_i={last}")

    # --- events_drawdown: integer-unit hourly net values.
    DDV = [5, -3, -4, 10, -2, -9, 1]
    cum = rm = 0
    best = (-1, None)
    for i, v in enumerate(DDV):
        cum += v
        rm = max(rm if i else cum, cum)
        dd = rm - cum
        if dd > best[0]: best = (dd, i)
    print(f"drawdown: n_hours={len(DDV)} max_dd={best[0]} trough_i={best[1]}")

    # --- events_wavelet: counts [5,3,8,7,7,4,9,6], scales 2/4/8.
    W = [5, 3, 8, 7, 7, 4, 9, 6]
    es = {}
    for j in (1, 2, 3):
        bs = 1 << j
        en, nb = 0, 0
        for b0 in range(0, len(W) - bs + 1, bs):
            blk = W[b0:b0 + bs]
            d = sum(blk[:bs // 2]) - sum(blk[bs // 2:])
            en += d * d
            nb += 1
        es[j] = (nb, en)
    etot = sum(e for _, e in es.values())
    for j, (nb, en) in es.items():
        print(f"wavelet scale={j}: n_blocks={nb} energy={en} "
              f"share={r6(en/etot)}")
        check_far(f"wavelet.{j}", en / etot)

    # --- events_sax: alternating [2,9]x4 -> exact t = 0.6745*sqrt(784).
    S8 = [2, 9] * 4
    n, sx = len(S8), sum(S8)
    a2 = n * sum(x * x for x in S8) - sx * sx
    t = 0.6745 * math.sqrt(a2)
    syms = []
    for x in S8:
        dd = x * n - sx
        syms.append('a' if dd < -t else 'b' if dd < 0 else
                    'c' if dd < t else 'd')
    from collections import Counter
    mot = Counter(''.join(syms[i:i+3]) for i in range(len(syms) - 2))
    print(f"sax: A2={a2} t={t:.4f} syms={''.join(syms)} motifs={dict(mot)}")

    # --- sketch_f2: freqs {1:3,2:1,3:2,4:1,5:1}, 32 md5 tug-of-war signs.
    freqs = {1: 3, 2: 1, 3: 2, 4: 1, 5: 1}
    exact = sum(f * f for f in freqs.values())
    sums = []
    for i in range(32):
        si = 0
        for u, f in freqs.items():
            h = int(hashlib.md5(f"{u}#{i}".encode()).hexdigest()[:15], 16)
            si += f * (1 - 2 * (h % 2))
        sums.append(si)
    gs = sorted((sum(s * s for s in sums[g*8:(g+1)*8]), g) for g in range(4))
    m23 = gs[1][0] + gs[2][0]
    print(f"f2: exact={exact} gsums={[g[0] for g in gs]} m23={m23} "
          f"estimate={m23/16.0} ratio={r6(m23/16.0/exact)}")
    check_far("f2.ratio", m23 / 16.0 / exact)

    # --- events_mcf: 3 users, purchases at ages 1,3 (u1) and 2 (u2).
    terms = {1: (1, 3), 2: (1, 3), 3: (1, 2)}  # k -> (d, n_risk)
    cum_n = 0
    for k in sorted(terms):
        d, nr = terms[k]
        cum_n += round(d / nr * 1e9)
        print(f"mcf k={k}: d={d} n_risk={nr} mcf={r6(cum_n/1e9)}")

    # --- littles_law: sessions [0,600e6] and [300e6,1200e6] us.
    print("littles: area=1.5e9 dur=1.5e9 equal=True horizon=1.2e9 "
          f"avg={r6(1.5e9/1.2e9)}")

    # --- gorilla_bits: one user, ms stamps [0,100,200,300,1000].
    def bkt(c):
        return 1 if c == 0 else 9 if -63 <= c <= 64 else \
            12 if -255 <= c <= 256 else 16 if -2047 <= c <= 2048 else 36
    ms = [0, 100, 200, 300, 1000]
    bits, zero, over = [], 0, 0
    for i, t_ in enumerate(ms):
        if i == 0: bits.append(64)
        elif i == 1: bits.append(bkt(ms[1] - ms[0]))
        else:
            dod = (ms[i] - ms[i-1]) - (ms[i-1] - ms[i-2])
            bits.append(bkt(dod))
    zero = sum(1 for b in bits if b == 1)
    over = sum(1 for b in bits if b == 36)
    print(f"gorilla: bits={bits} total={sum(bits)} zero_dod={zero} "
          f"overflow={over} ratio={r6(sum(bits)/(64*len(ms)))}")

    # --- changepoint_binseg: [2,2,2,8,8,8].
    Y = [2, 2, 2, 8, 8, 8]
    st, nt = sum(Y), len(Y)
    best = (-1e18, None)
    for nl_ in range(1, nt):
        sl = sum(Y[:nl_])
        g = round(sl*sl/nl_ + (st-sl)**2/(nt-nl_) - st*st/nt, 6)
        print(f"  binseg nl={nl_}: gain={g}")
        if g > best[0]: best = (g, nl_)
    print(f"binseg: best nl={best[1]} gain={best[0]} "
          f"mean_l={sum(Y[:best[1]])/best[1]} "
          f"mean_r={(st-sum(Y[:best[1]]))/(nt-best[1])}")

    # --- extremal_index: perm of 1..20, 19@h3 20@h4 adjacent.
    # u = 18th smallest = 18; exceedances {19,20} adjacent -> 1 cluster.
    print("extremal: u=18 n_exc=2 n_clusters=1 theta=0.5")


if __name__ == "__main__":
    tranche15()


def tranche16():
    print("\n===== tranche 16: causal/experimentation =====")

    # --- ab_tost: the Welch fixture arms, 5%-of-grand-mean margin.
    A = [10.0, 12.0, 14.0, 16.0, 18.0]
    B = [11.0, 14.0, 19.0, 23.0, 27.0]
    mu_a, mu_b = mean(A), mean(B)
    s2a, s2b = var_samp(A), var_samp(B)
    margin = 0.05 * (sum(A) + sum(B)) / (len(A) + len(B))
    se = math.sqrt(s2a / len(A) + s2b / len(B))
    tl = (mu_b - mu_a + margin) / se
    tu = (margin - (mu_b - mu_a)) / se
    print(f"tost: diff={r6(mu_b-mu_a)} margin={r6(margin)} "
          f"t_lower={r6(tl)} t_upper={r6(tu)} "
          f"equivalent={tl > 1.644854 and tu > 1.644854}")
    check_far("tost.tl", tl); check_far("tost.tu", tu)

    # --- rdd_discount: perfect-fit local lines each side of dc=5.
    # L: (2,14),(3,16),(4,18) -> q = 10 + 2 dc; R: (5,35),(6,36),(7,37).
    print("rdd: slope_l=2 fit_l=20 slope_r=1 fit_r=35 jump=15")

    # --- bandit_replay: 2 arms x 4 hours, Beta(1,1) follow-the-leader.
    plays = {('a', 0): (2, 2), ('a', 1): (2, 0), ('a', 2): (2, 0),
             ('a', 3): (1, 0), ('b', 0): (2, 1), ('b', 1): (2, 2),
             ('b', 2): (2, 2)}
    for h in range(4):
        best = None
        for arm in ('a', 'b'):
            cn = sum(n for (a2, h2), (n, _) in plays.items()
                     if a2 == arm and h2 < h)
            cr = sum(r for (a2, h2), (_, r) in plays.items()
                     if a2 == arm and h2 < h)
            ctr = (cr + 1.0) / (cn + 2.0)
            if best is None or ctr > best[0] + 1e-15:
                best = (ctr, arm)
        n, r = plays.get((best[1], h), (0, 0))
        ctr_s = r6(r / n) if n else None
        print(f"bandit h={h}: chosen={best[1]} n_matched={n} ctr={ctr_s}")

    # --- uplift_qini: 5 bands of (control, treated) pairs.
    # band -> (y_train_t, y_train_c, y_test_t, y_test_c)
    bands = {1: (1, 0, 1, 0), 2: (0, 1, 0, 1), 3: (1, 1, 1, 0),
             4: (1, 0, 1, 0), 5: (0, 0, 0, 1)}
    rk = sorted(bands, key=lambda b: (-(bands[b][0] - bands[b][1]), b))
    cyt = cyc = 0
    for i, b in enumerate(rk):
        yt_t, yt_c, yte_t, yte_c = bands[b]
        cyt += yte_t; cyc += yte_c
        # nt=nc=1 per band so qini = cyt - cyc.
        print(f"qini rank={i+1}: band={b} uplift={yt_t - yt_c} "
              f"qini={cyt - cyc}")

    # --- ate_stratified: 5 strata, diffs 5..45, equal sizes.
    diffs = [5, 15, 25, 35, 45]
    print(f"ate: strata diffs={diffs} "
          f"ALL mean_t=145 mean_c=120 diff={sum(2*d for d in diffs)/10}")

    # --- ab_ratio_delta: per-user (x_sum, y_count) exact moments.
    ua = [(30.0, 2), (30.0, 1), (60.0, 2)]   # uids 1,3,5 (arm A)
    ub = [(10.0, 1), (50.0, 2), (60.0, 1)]   # uids 2,4,6 (arm B)

    def delta(us):
        n = len(us)
        sx = sum(x for x, _ in us); sy = sum(y for _, y in us)
        r = sx / sy
        vx = var_samp([x for x, _ in us])
        vy = var_samp([float(y) for _, y in us])
        m = (mean([x for x, _ in us]), mean([float(y) for _, y in us]))
        cxy = sum((x - m[0]) * (y - m[1]) for x, y in us) / (n - 1)
        se = math.sqrt((vx - 2 * r * cxy + r * r * vy) / n) / (sy / n)
        return n, r, se
    na, ra, sea = delta(ua)
    nb, rb, seb = delta(ub)
    z = (rb - ra) / math.sqrt(sea ** 2 + seb ** 2)
    print(f"ratio_delta: r_a={r6(ra)} r_b={r6(rb)} se_a={r6(sea)} "
          f"se_b={r6(seb)} z={r6(z)}")
    check_far("rd.sea", sea); check_far("rd.seb", seb); check_far("rd.z", z)

    # --- ab_group_sequential: 16 events, looks of 4, OBF bounds.
    seq = [('A', 1), ('B', 0), ('A', 1), ('B', 0),
           ('A', 0), ('B', 1), ('A', 0), ('B', 1),
           ('A', 1), ('B', 1), ('A', 0), ('B', 0),
           ('A', 0), ('A', 1), ('B', 1), ('B', 1)]
    bounds = {1: 4.049, 2: 2.863, 3: 2.337, 4: 2.024}
    ca = cb = xa = xb = 0
    for lk in range(1, 5):
        for arm, x in seq[(lk - 1) * 4:lk * 4]:
            if arm == 'A': ca += 1; xa += x
            else: cb += 1; xb += x
        pp = (xa + xb) / (ca + cb)
        z = ((xb / cb - xa / ca)
             / math.sqrt(pp * (1 - pp) * (1 / ca + 1 / cb)))
        print(f"gst look={lk}: n_a={ca} n_b={cb} z={r6(z)} "
              f"crossed={abs(z) >= bounds[lk]}")
        check_far(f"gst.z{lk}", z)


if __name__ == "__main__":
    tranche16()


def tranche17():
    print("\n===== tranche 17: eval + survey/shrinkage =====")
    import hashlib

    # --- purchaseScored fixture: test rows (event_id, y, p).
    rows = [(6, 0, 0.5), (7, 1, 0.5), (8, 1, 1.0),
            (9, 0, 0.0), (10, 0, 0.0), (11, 1, 0.6)]
    # pr_auc: rank by (p desc, id asc).
    ranked = sorted(rows, key=lambda r: (-r[2], r[0]))
    cum = 0
    sppm = 0
    for rk, (i, y, p) in enumerate(ranked, 1):
        cum += y
        if y:
            sppm += round(cum * 1e6 / rk)
    npos = sum(y for _, y, _ in rows)
    print(f"pr_auc: n_pos={npos} ap={r6(sppm/1e6/npos)} "
          f"base={r6(npos/len(rows))}")
    # r-precision at depth R=3.
    rp = sum(y for _, y, _ in ranked[:npos])
    print(f"rprec: {r6(rp/npos)}")
    # mcc at threshold p_base=0.6.
    tp = sum(1 for _, y, p in rows if y and p >= 0.6)
    fp = sum(1 for _, y, p in rows if not y and p >= 0.6)
    fn = sum(1 for _, y, p in rows if y and p < 0.6)
    tn = sum(1 for _, y, p in rows if not y and p < 0.6)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    print(f"mcc: tp={tp} fp={fp} fn={fn} tn={tn} prec={r6(tp/(tp+fp))} "
          f"rec={r6(tp/(tp+fn))} f1={r6(2*tp/(2*tp+fp+fn))} mcc={r6(mcc)}")
    # ece bins: one row per bin, (p asc, id).
    bins = sorted(rows, key=lambda r: (r[2], r[0]))
    ybar = npos / len(rows)
    ece = sum(abs(p - y) for _, y, p in bins) / len(rows)
    rel = sum((p - y) ** 2 for _, y, p in bins) / len(rows)
    res = sum((y - ybar) ** 2 for _, y, p in bins) / len(rows)
    unc = ybar * (1 - ybar)
    print(f"ece: {r6(ece)} rel={r6(rel)} res={r6(res)} unc={r6(unc)} "
          f"brier_dec={r6(rel - res + unc)}")
    # ks over distinct scores.
    from collections import defaultdict
    cs = defaultdict(lambda: [0, 0])
    for _, y, p in rows:
        cs[p][0 if y else 1] += 1
    n1 = sum(v[0] for v in cs.values()); n0 = sum(v[1] for v in cs.values())
    cc1 = cc0 = 0; best = (-1, None)
    for p in sorted(cs):
        cc1 += cs[p][0]; cc0 += cs[p][1]
        g = abs(cc1 * n0 - cc0 * n1)
        if g > best[0]: best = (g, p)
    print(f"ks: {r6(best[0]/(n1*n0))} at_p={best[1]}")
    # brier + logloss.
    br = sum((p - y) ** 2 for _, y, p in rows) / len(rows)
    ll = 0.0
    for _, y, p in rows:
        pc = min(max(p, 1e-6), 1 - 1e-6)
        ll += -(y * math.log(pc) + (1 - y) * math.log(1 - pc))
    print(f"brier: {r6(br)} logloss={r6(ll/len(rows))}")
    check_far("ll", ll / len(rows))
    # lift deciles (one row per bin).
    cumn = cump = 0
    for d, (i, y, p) in enumerate(ranked, 1):
        cumn += 1; cump += y
        print(f"lift d={d}: n_pos={y} capture={r6(cump/npos)} "
              f"lift={r6(cump*len(rows)/(npos*cumn))}")

    # --- shrinkage_means: 4 types, means 10/20/30/40, varm 4 each.
    mus, mug, k = [10, 20, 30, 40], 25, 4
    ss = sum((m - mug) ** 2 for m in mus)
    c = max(0.0, 1 - (k - 3) * 4 / ss)
    for m in mus:
        print(f"shrink mu={m}: c={r6(c)} shrunken={r6(mug + c*(m - mug))}")

    # --- brr_se: users 1..6, single events 10..60 (micros exact).
    vals = {u: 10.0 * u for u in range(1, 7)}
    nt = len(vals); svt = sum(vals.values())
    full = svt / nt
    snano = 0
    for rep in range(8):
        inc = {u: v for u, v in vals.items()
               if (int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
                   >> rep) % 2 == 1}
        m = sum(inc.values()) / len(inc)
        snano += round((m - full) ** 2 * 1e9)
        print(f"  brr rep={rep}: users={sorted(inc)} mean={m}")
    print(f"brr: full_mean={r6(full)} se={r6(math.sqrt(snano/1e9/8))}")
    check_far("brr.se", math.sqrt(snano / 1e9 / 8))

    # --- ipf_raking: cells en-s1:4 en-s2:2 de-s1:1 de-s2:1.
    cells = {("en", "s1"): 4, ("en", "s2"): 2,
             ("de", "s1"): 1, ("de", "s2"): 1}
    n = sum(cells.values()); kl = 2
    ctgt = {"s1": 5, "s2": 3}
    w = {c: o * 10 ** 9 for c, o in cells.items()}
    for step in (1, 2, 3, 4):
        if step % 2 == 1:
            ms = {l: sum(v for (l2, _), v in w.items() if l2 == l)
                  for l in ("en", "de")}
            w = {c: round(w[c] * (n / kl) * 1e9 / ms[c[0]]) for c in w}
        else:
            ms = {s: sum(v for (_, s2), v in w.items() if s2 == s)
                  for s in ("s1", "s2")}
            w = {c: round(w[c] * ctgt[c[1]] * 1e9 / ms[c[1]]) for c in w}
    for c in sorted(w):
        print(f"ipf {c}: weight={r6(w[c]/1e9)} factor={r6(w[c]/1e9/cells[c])}")
        check_far(f"ipf.{c}", w[c] / 1e9)
        check_far(f"ipff.{c}", w[c] / 1e9 / cells[c])
    for l in ("de", "en"):
        sw = sum(v for (l2, _), v in w.items() if l2 == l)
        sww = sum(v * v for (l2, _), v in w.items() if l2 == l)
        nd = sum(o for (l2, _), o in cells.items() if l2 == l)
        print(f"ess {l}: ess={r6(sw*sw/sww)} ratio={r6(sw*sw/sww/nd)}")
        check_far(f"ess.{l}", sw * sw / sww)


if __name__ == "__main__":
    tranche17()


def tranche18():
    print("\n===== tranche 18: info-theory, inequality, tails =====")

    # --- mi_matrix docs cells (en,s1):2 (en,s2):1 (de,s1):1.
    def mi_nano(cells):
        n = sum(cells.values())
        from collections import Counter
        nx = Counter(); ny = Counter()
        for (x, y), c in cells.items():
            nx[x] += c; ny[y] += c
        mi = sum(round((c / n) * math.log(c * n / (nx[x] * ny[y])) * 1e9)
                 for (x, y), c in cells.items())
        hx = sum(round(-(v / n) * math.log(v / n) * 1e9) for v in nx.values())
        hy = sum(round(-(v / n) * math.log(v / n) * 1e9) for v in ny.values())
        nmi = mi / math.sqrt(hx * hy) if hx and hy else None
        return n, r6(mi / 1e9), r6(hx / 1e9), r6(hy / 1e9), \
            r6(nmi) if nmi is not None else None
    docs = {("en", "s1"): 2, ("en", "s2"): 1, ("de", "s1"): 1}
    evs = {("a", 0): 3, ("b", 0): 1, ("b", 1): 2}
    print(f"mi docs: {mi_nano(docs)}")
    print(f"mi events: {mi_nano(evs)}")

    # --- events_uncertainty on the same events cells: H from
    # ln N - (sum c ln c)/N with nano-rounded c ln c terms.
    n = sum(evs.values())
    from collections import Counter
    nx = Counter(); ny = Counter()
    for (x, y), c in evs.items():
        nx[x] += c; ny[y] += c
    def hh(counter):
        s_ = sum(round(c * math.log(c) * 1e9) for c in counter.values())
        return math.log(n) - s_ / 1e9 / n
    hxy = math.log(n) - sum(round(c * math.log(c) * 1e9)
                            for c in evs.values()) / 1e9 / n
    hx, hy = hh(nx), hh(ny)
    mi = hx + hy - hxy
    print(f"uncert: h_type={r6(hx)} h_hour={r6(hy)} mi={r6(mi)} "
          f"u_t|h={r6(mi/hx)} u_h|t={r6(mi/hy)}")
    for nm, v in [("hx", hx), ("hy", hy), ("mi", mi), ("ut", mi/hx),
                  ("uh", mi/hy)]:
        check_far(f"unc.{nm}", v)

    # --- events_lagged_mi: 28-hour cycle 1,2,3,4 repeating; exact
    # ntile(4) puts each count level in its own bin.
    series = [(i % 4) + 1 for i in range(28)]
    for k in (1, 24):
        pairs = Counter((series[i - k], series[i])
                        for i in range(k, len(series)))
        npair = sum(pairs.values())
        cx = Counter(); cy = Counter()
        for (a, b), c in pairs.items():
            cy[a] += c; cx[b] += c
        def s9(counter):
            return sum(round(c * math.log(c) * 1e9) for c in counter.values())
        mi = ((math.log(npair) - s9(cx) / 1e9 / npair)
              + (math.log(npair) - s9(cy) / 1e9 / npair)
              - (math.log(npair) - s9(pairs) / 1e9 / npair))
        print(f"lagged_mi k={k}: n_pairs={npair} mi={r6(mi)}")
        check_far(f"lmi.{k}", mi)

    # --- revenue_theil: customer cents 10000,20000,30000,40000.
    cents = [10000, 20000, 30000, 40000]
    S, nn = sum(cents), len(cents)
    st = sum(round((c * nn / S) * math.log(c * nn / S) * 1e9) for c in cents)
    sl = sum(round(math.log(c * nn / S) * 1e9) for c in cents)
    print(f"theil: mean_rev={S/nn/100} T={r6(st/1e9/nn)} L={r6(-sl/1e9/nn)}")
    check_far("theil.t", st / 1e9 / nn); check_far("theil.l", -sl / 1e9 / nn)

    # --- revenue_atkinson: one nation, customer cents 10000/20000/40000.
    ac = [10000, 20000, 40000]
    sl = sum(round(math.log(c) * 1e9) for c in ac)
    atk = 1 - math.exp(sl / 1e9 / 3) / (sum(ac) / 3)
    print(f"atkinson: total={sum(ac)/100} a={r6(atk)}")
    check_far("atk", atk)

    # --- woe_iv: band0 4 orders 1 bad, band1 4 orders 3 bad.
    bands = {0: (4, 1), 1: (4, 3)}  # band -> (n, bad)
    g = sum(n - b for n, b in bands.values())
    b_ = sum(b for _, b in bands.values())
    ivn = 0
    for bd, (n, bad) in bands.items():
        good = n - bad
        woe = math.log((2 * good + 1) * b_ / ((2 * bad + 1) * g))
        t = round((good / g - bad / b_) * woe * 1e9)
        ivn += t
        print(f"woe band={bd}: woe={r6(woe)} iv_term={r6(t/1e9)}")
        check_far(f"woe.{bd}", woe)
    print(f"woe iv_total={r6(ivn/1e9)}")

    # --- events_tail_index: milli-values 8000,4000,2000,1000.
    vs = [8000, 4000, 2000, 1000]
    lsum = sum(round(math.log(v) * 1e9) for v in vs)
    lk = round(math.log(vs[-1]) * 1e9)
    alpha = (len(vs) - 1) * 1e9 / (lsum - len(vs) * lk)
    print(f"hill: k={len(vs)} x_k={vs[-1]/1e3} alpha={r6(alpha)}")
    check_far("hill", alpha)


if __name__ == "__main__":
    tranche18()


def tranche19():
    print("\n===== tranche 19: embedding linear algebra =====")
    # Fixture (+-2,0),(0,+-1),(0,0): mean 0, sample cov diag(2, 0.5)
    # (sum x^2 = 8, sum y^2 = 2, over n-1 = 4). Hand-diagonalizable:
    # eigenpairs (2, e_x), (0.5, e_y).
    print("pca: eigval=2.0 explained=2/2.5=0.8 resid=0.0")
    # Mahalanobis: inv = diag(0.5, 2); d2 = x^2/2 + 2 y^2 ->
    # 2,2,2,2,0; trace identity sum = 8 = d(n-1).
    print("mahal2: [2.0, 2.0, 2.0, 2.0, 0.0] sum=8=d(n-1)")
    # Whitening: W = diag(1/sqrt2, sqrt2); whitened cov = I to 1 ulp.
    print("whiten: max_mean=0 max_diag_err=0 max_offdiag=0 (6dp)")


if __name__ == "__main__":
    tranche19()


def tranche20():
    print("\n===== tranche 20: retrieval + eval + LM + agreement =====")

    # Shared retrieval corpus (query: vector, key, dup). d2 and d3 have
    # IDENTICAL bm25 stats for 'key' (tf 1, dl 8) so bm25 ties them
    # (doc_id break: d2 then d3), but d2's norm is dominated by the
    # repeated 'zz' (tf 7) while d3's fillers are distinct -> tfidf
    # ranks d3 above d2: one discordant pair by construction.
    docs = {
        1: ("vector key dup", 500),
        2: ("key zz zz zz zz zz zz zz", 160),
        3: ("key aa bb cc dd ee ff gg", 310),
        4: ("nothing relevant at all", 10),
    }
    toks = {d: t.split() for d, (t, _) in docs.items()}
    N = len(docs)
    dl = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dl.values()) / N
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    Q = ["vector", "key", "dup"]

    # --- bm25 per-term scores (round per term to 6dp, then sum+round)
    k1, b = 1.2, 0.75
    bm_score = {}
    for d, ts in toks.items():
        s, hits = 0.0, 0
        for q in Q:
            tf = ts.count(q)
            if tf == 0:
                continue
            idf = math.log(1 + (N - df[q] + 0.5) / (df[q] + 0.5))
            term = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl[d] / avgdl))
            s += r6(term)
            hits += 1
        if hits:
            bm_score[d] = (r6(s), hits)
    bm_rank = {d: r for r, (d, _) in enumerate(
        sorted(bm_score.items(), key=lambda kv: (-kv[1][0], kv[0])), 1)}
    print(f"bm25: scores={bm_score} ranks={bm_rank}")

    # --- tfidf_search: w = tf*ln(N/df), cosine vs idf query vector
    tf_score = {}
    qw = {q: math.log(N / df[q]) for q in Q if df[q] < N}
    qnorm = math.sqrt(sum(w * w for w in qw.values()))
    for d, ts in toks.items():
        w = {t: ts.count(t) * math.log(N / df[t]) for t in set(ts)}
        norm = math.sqrt(sum(v * v for v in w.values()))
        dot = sum(w.get(q, 0.0) * qw[q] for q in qw)
        hits = sum(1 for q in qw if q in w)
        if hits:
            sc = r6(dot / (norm * qnorm))
            tf_score[d] = (sc, hits)
            check_far(f"tfidf.{d}", dot / (norm * qnorm))
    tf_rank = {d: r for r, (d, _) in enumerate(
        sorted(tf_score.items(), key=lambda kv: (-kv[1][0], kv[0])), 1)}
    print(f"tfidf: scores={tf_score} ranks={tf_rank}")

    # --- search_rrf: full-outer of the two lists, 1/(60+rank)
    all_docs = sorted(set(bm_rank) | set(tf_rank))
    for d in all_docs:
        ra, rb = bm_rank.get(d), tf_rank.get(d)
        rrf = (1 / (60 + ra) if ra else 0) + (1 / (60 + rb) if rb else 0)
        nl = (1 if ra else 0) + (1 if rb else 0)
        print(f"rrf doc={d}: rrf={r6(rrf)} n_lists={nl}")
        check_far(f"rrf.{d}", rrf)

    # --- search_rbo: docs in both lists, wt = 0.1*0.9^(d-1)/d for d>=m
    common = sorted(set(bm_rank) & set(tf_rank))
    rbo = 0.0
    for d in common:
        m = max(bm_rank[d], tf_rank[d])
        for depth in range(m, 11):
            rbo += 0.1 * 0.9 ** (depth - 1) / depth
    print(f"rbo: n_overlap10={len(common)} rbo={r6(rbo)}")
    check_far("rbo", rbo)

    # --- search_tau: tau-a over common docs
    C = D = 0
    for i, d1 in enumerate(common):
        for d2 in common[i + 1:]:
            sgn = (bm_rank[d1] - bm_rank[d2]) * (tf_rank[d1] - tf_rank[d2])
            if sgn > 0:
                C += 1
            elif sgn < 0:
                D += 1
    n = len(common)
    tau = 2 * (C - D) / (n * (n - 1))
    print(f"tau: n_common={n} concordant={C} discordant={D} tau={r6(tau)}")

    # --- eval_err on the bm25 ranking: g = min(3, n_chars div 150)
    order = sorted(bm_rank.items(), key=lambda kv: kv[1])
    st, sg = 0, 0
    fs = []
    for d, r in order:
        g = min(3, docs[d][1] // 150)
        num = {0: 0, 1: 1, 2: 3, 3: 7}[g]
        pnum = 1
        for f2 in fs:
            pnum *= f2
        term = round(num * pnum / (8 ** r * r) * 1e9)
        st += term
        sg += num
        print(f"err rank={r} doc={d} g={g} num={num} pnum={pnum} term_nano={term}")
        fs.append(8 - num)
    print(f"err: n_results={len(order)} sum_gain={sg} err={r6(st / 1e9)}")

    # --- eval_regression: per-part mean predictor
    parts = {1: [1.0, 3.0], 2: [5.0]}
    rows = [(q, mean(parts[p])) for p, qs in parts.items() for q in qs]
    nn = len(rows)
    sse = sum((p - l) ** 2 for l, p in rows)
    sae = sum(abs(p - l) for l, p in rows)
    sl = sum(l for l, _ in rows)
    sll = sum(l * l for l, _ in rows)
    mse = sse / nn
    r2 = 1 - sse / (sll - sl * sl / nn)
    print(f"regression: n={nn} mse={r6(mse)} rmse={r6(math.sqrt(mse))} "
          f"mae={r6(sae / nn)} r2={r6(r2)}")
    check_far("reg.rmse", math.sqrt(mse))

    # --- eval_mrr: first-relevant rank within top 10, ppm rounding
    # u1: fr=2, u2: fr=1, u3: relevant at rank 11 -> 0.
    frs = [2, 1, None]
    sppm = sum(round(1e6 / f) if f else 0 for f in frs)
    print(f"mrr: n_users=3 n_hit10=2 mrr_at_10={r6(sppm / 1e6 / 3)}")

    # --- eval_calibration: cell means {hod0: (1+3)/2=2, hod1: 10},
    # global 14/3; test rows (hod0,4),(hod1,8),(hod2,6) -> ntile = rank.
    g = 14 / 3
    print(f"calibration: bin1 pred=2.0 act=4.0; bin2 pred={r6(g)} act=6.0; "
          f"bin3 pred=10.0 act=8.0")

    # --- lm_score: corpus d1='a a a a a b', d2='a b c'; minCount 5
    tot = 9
    lpa = math.log(6 / tot)
    floor = math.log(1 / tot)
    m1 = (5 * lpa + floor) / 6
    m2 = (lpa + 2 * floor) / 3
    print(f"lm_score: d1 n=6 logp={r6(m1)}; d2 n=3 logp={r6(m2)}")
    check_far("lm.1", m1); check_far("lm.2", m2)

    # --- lm_bigram_score: bi minCount 3 keeps only 'a a' (4 of n_a=6);
    # backoff ln(0.4) + unigram(b|c) = floor (both < minCount 5).
    bb = math.log(4 / 6)
    back = math.log(0.4) + floor
    b1 = (4 * bb + back) / 5
    b2 = (2 * back) / 2
    print(f"lm_bigram: d1 n=5 logp={r6(b1)}; d2 n=2 logp={r6(b2)}")
    check_far("lmb.1", b1); check_far("lmb.2", b2)

    # --- nb_lang_classify: train d2(en,'the cat') d4(de,'der hund');
    # test d1(en,'the dog') d3(de,'der cat'). v=4, t_l=2 each.
    w_hit = round(math.log(2 / 6) * 1e9)
    w_def = round(math.log(1 / 6) * 1e9)
    prior = round(math.log(1 / 2) * 1e9)
    s_en_d1 = prior + w_hit + w_def
    s_de_d1 = prior + 2 * w_def
    print(f"nb d1: en={s_en_d1} de={s_de_d1} -> pred en (true en)")
    s_en_d3 = prior + w_def + w_hit
    s_de_d3 = prior + w_hit + w_def
    assert s_en_d3 == s_de_d3
    print(f"nb d3: en==de={s_en_d3} tie -> row_number picks 'de' (true de)")
    print("nb: accuracy=1.0 cells: (en,en,1),(de,de,1)")

    # --- langid_kappa: cells (en,en)=1,(de,de)=1,(en,und)=1,(de,fr)=1
    nt, po_num = 4, 2
    pe_num = 2 * 1 + 2 * 1
    kappa = (po_num * nt - pe_num) / (nt * nt - pe_num)
    print(f"kappa: n_docs={nt} po={r6(po_num / nt)} pe={r6(pe_num / nt ** 2)} "
          f"kappa={r6(kappa)}")


if __name__ == "__main__":
    tranche20()


def tranche21():
    print("\n===== tranche 21: co-purchase graph family =====")
    # Fixture graph: triangle {1,2,3} - bridge 3-4 - triangle {4,5,6},
    # second triangle {5,6,7} sharing edge 5-6 via vertex 7, pendant
    # chain 7-8-9. Each edge realized by exactly TWO 2-item orders, so
    # Cooccur.pairs(minCount=2) reproduces the edge list verbatim.
    E = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6),
         (5, 7), (6, 7), (7, 8), (8, 9)]
    nb = {}
    for a, b in E:
        nb.setdefault(a, set()).add(b)
        nb.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in nb.items()}
    n_baskets = 2 * len(E)
    marg = {v: 2 * deg[v] for v in nb}
    print(f"deg={deg}")

    # --- item_cooc: n_ab=2, lift = 2*N/(n_a*n_b)
    for a, b in E:
        lift = r6(2 * n_baskets / (marg[a] * marg[b]))
        print(f"cooc ({a},{b}): n_ab=2 lift={lift}")

    # --- graph_assortativity: Pearson over symmetric endpoint degrees
    pts = [(deg[a], deg[b]) for a, b in E] + [(deg[b], deg[a]) for a, b in E]
    n = len(pts)
    mx = sum(p[0] for p in pts) / n
    my = sum(p[1] for p in pts) / n
    sxy = sum((x - mx) * (y - my) for x, y in pts)
    sxx = sum((x - mx) ** 2 for x, _ in pts)
    syy = sum((y - my) ** 2 for _, y in pts)
    r = sxy / math.sqrt(sxx * syy)
    print(f"assortativity: n_nodes={len(nb)} n_edges={len(E)} r={r6(r)}")
    check_far("assort", r)

    # --- link_adamic_adar / link_jaccard over non-edges
    es = {frozenset(e) for e in E}
    verts = sorted(nb)
    aa, jac = [], []
    for i, a in enumerate(verts):
        for b in verts[i + 1:]:
            if frozenset((a, b)) in es:
                continue
            common = [w for w in nb[a] & nb[b] if 2 <= deg[w] <= 100]
            if not common:
                continue
            score = sum(round(1e6 / math.log(deg[w])) for w in common)
            aa.append((-score, a, b, len(common)))
            ppm = round(len(common) * 1e6 / (deg[a] + deg[b] - len(common)))
            jac.append((-ppm, a, b, len(common), deg[a], deg[b]))
    for s, a, b, c in sorted(aa):
        print(f"aa ({a},{b}): n_common={c} score_us={-s}")
    for p, a, b, c, da, db in sorted(jac):
        print(f"jaccard ({a},{b}): n_common={c} deg=({da},{db}) ppm={-p}")

    # --- graph_communities: 3 synchronous LPA rounds, tie -> min label
    lab = {v: v for v in nb}
    for it in range(3):
        nxt = {}
        for u in nb:
            cnt = {}
            for v in nb[u]:
                cnt[lab[v]] = cnt.get(lab[v], 0) + 1
            nxt[u] = min(cnt, key=lambda l: (-cnt[l], l))
        lab = nxt
        print(f"lpa round {it + 1}: {lab}")
    comm = {}
    for v, l in lab.items():
        comm.setdefault(l, []).append(v)
    print(f"communities: {comm}")

    # --- graph_modularity: Q = (4m*E_in - sum d_c^2)/(4m^2)
    m = len(E)
    e_in = sum(1 for a, b in E if lab[a] == lab[b])
    dc = {}
    for v in nb:
        dc[lab[v]] = dc.get(lab[v], 0) + deg[v]
    sdsq = sum(d * d for d in dc.values())
    q = (4 * m * e_in - sdsq) / (4 * m * m)
    print(f"modularity: n_comm={len(dc)} m={m} e_in={e_in} "
          f"sum_dsq={sdsq} Q={r6(q)}")
    check_far("modQ", q)

    # --- graph_kcore: 4 peel rounds at deg >= 2 (pendant cascade 9->8)
    sym = set()
    for a, b in E:
        sym.add((a, b)); sym.add((b, a))
    for it in range(4):
        d = {}
        for a, _ in sym:
            d[a] = d.get(a, 0) + 1
        keep = {v for v, dd in d.items() if dd >= 2}
        sym = {(a, b) for a, b in sym if a in keep and b in keep}
    core = {}
    for a, _ in sym:
        core[a] = core.get(a, 0) + 1
    print(f"kcore: {dict(sorted(core.items()))}")

    # --- graph_richclub: phi at k=2 (and the n_rich<2 null at 4/8)
    for k in (2, 4, 8):
        rich = {v for v in nb if deg[v] >= k}
        er = sum(1 for a, b in E if a in rich and b in rich)
        phi = (er * 2 * 10000) // (len(rich) * (len(rich) - 1)) \
            if len(rich) >= 2 else None
        print(f"richclub k={k}: n_rich={len(rich)} e_rich={er} phi_bp={phi}")
    print(f"density_all_bp={len(E) * 2 * 10000 // (len(nb) * (len(nb) - 1))}")

    # --- graph_hits: 3 unrolled authority rounds on order-part incidence
    baskets = []
    for a, b in E:
        baskets.append((a, b)); baskets.append((a, b))
    a1 = {v: marg[v] for v in nb}
    h1 = [a1[x] + a1[y] for x, y in baskets]
    a2 = {v: 0 for v in nb}
    for (x, y), h in zip(baskets, h1):
        a2[x] += h; a2[y] += h
    h2 = [a2[x] + a2[y] for x, y in baskets]
    a3 = {v: 0 for v in nb}
    for (x, y), h in zip(baskets, h2):
        a3[x] += h; a3[y] += h
    print("hits authority:",
          sorted(a3.items(), key=lambda kv: (-kv[1], kv[0])))

    # --- graph_ppr: 5 unrolled pico rounds from seed = min vertex = 1
    def hup(x):
        return math.floor(x + 0.5)
    p = {1: 1_000_000_000_000}
    for it in range(5):
        m_ = {}
        for sv, pp in p.items():
            for tv in nb[sv]:
                m_[tv] = m_.get(tv, 0) + hup(pp / deg[sv])
        p = {tv: hup(0.85 * mm) for tv, mm in m_.items()}
        p[1] = p.get(1, 0) + 150_000_000_000
    print("ppr:", sorted(p.items(), key=lambda kv: (-kv[1], kv[0])))
    for v, pp in p.items():
        print(f"  ppr v={v}: pp_pico={pp} ppr={r6(pp / 1e12)}")


if __name__ == "__main__":
    tranche21()


def tranche22():
    print("\n===== tranche 22: remaining series family =====")

    def pearson(xs, ys):
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        sxx = sum((x - mx) ** 2 for x in xs)
        syy = sum((y - my) ** 2 for y in ys)
        return sxy / math.sqrt(sxx * syy)

    # --- events_acf: hourly counts c over 8 consecutive hours
    c = [5, 2, 4, 1, 6, 3, 5, 2]
    for k in (1, 2, 3):
        r = pearson(c[k:], c[:-k])
        print(f"acf{k} = {r6(r)}")
        check_far(f"acf{k}", r)

    # --- events_ccf: view = c, click = view shifted by 2 (peak lag 2)
    view = c
    click = [1, 1] + c[:-2]
    for lag in range(7):
        xs = view[:len(view) - lag] if lag else view
        ys = click[lag:]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        r = num / math.sqrt(dx * dy) if dx > 0 and dy > 0 else None
        print(f"ccf lag={lag}: n={n} r={r6(r) if r is not None else None}")
        if r is not None:
            check_far(f"ccf{lag}", r)

    # --- events_ewma: alpha chain wt = 0.7^(t-j), normalized
    for t in range(len(c)):
        ws = [0.7 ** (t - j) for j in range(t + 1)]
        ew = sum(w * x for w, x in zip(ws, c)) / sum(ws)
        print(f"ewma h{t}: n={c[t]} ewma={r6(ew)}")
        check_far(f"ewma{t}", ew)

    # --- events_cusum: s_t = cumsum(c - mean), max |s| (tie earliest)
    mu = sum(c) / len(c)
    s, best = 0.0, (0.0, -1)
    for i, x in enumerate(c):
        s += x - mu
        if abs(s) > best[0] + 1e-12:
            best = (abs(s), i)
    print(f"cusum: n_hours={len(c)} max={r6(best[0])} peak_i={best[1]}")

    # --- events_geomean: t1 [2,4,8] -> 4.0; t2 [1,8] (0 and -5 dropped)
    print(f"geomean t1 = {r6(math.exp(sum(map(math.log, [2, 4, 8])) / 3))}")
    print(f"geomean t2 = {r6(math.exp(sum(map(math.log, [1, 8])) / 2))}")

    # --- events_twap: day-0 events (0h,10),(6h,20),(18h,40)
    tw = (10 * 6 + 20 * 12 + 40 * 6) / 24
    print(f"twap = {r6(tw)} plain_avg = {r6(70 / 3)}")

    # --- events_negbin: counts [1,5,9] -> moment fit; [4,4,4] -> null
    xs = [1, 5, 9]
    n, sx = len(xs), sum(xs)
    sxx = sum(x * x for x in xs)
    muh = sx / n
    s2 = (n * sxx - sx * sx) / n / (n - 1)
    print(f"negbin A: mu={r6(muh)} s2={r6(s2)} r={r6(muh * muh / (s2 - muh))} "
          f"p={r6(muh / s2)}")

    # --- events_partial_corr: (value, day, hod) six events
    rows = [(1.0, 0, 1), (2.0, 0, 2), (3.0, 0, 3),
            (2.0, 1, 1), (4.0, 1, 2), (6.0, 1, 3)]
    v = [round(r[0] * 1000) for r in rows]
    h = [r[2] for r in rows]
    w = [(r[1] + 4) % 7 for r in rows]
    rvh, rvw, rhw = pearson(v, h), pearson(v, w), pearson(h, w)
    pc = (rvh - rvw * rhw) / math.sqrt((1 - rvw ** 2) * (1 - rhw ** 2))
    print(f"partial: r_vh={r6(rvh)} r_vw={r6(rvw)} r_hw={r6(rhw)} "
          f"r_vh_given_w={r6(pc)}")
    for nm, x in [("pvh", rvh), ("pvw", rvw), ("pc", pc)]:
        check_far(nm, x)

    # --- events_mad_outliers: milli values [1,2,3,4,100]*1000
    vm = [1000, 2000, 3000, 4000, 100000]
    med = sorted(vm)[(len(vm) + 1) // 2 - 1]
    dd = sorted(abs(x - med) for x in vm)
    mad = dd[(len(dd) + 1) // 2 - 1]
    outl = sum(1 for x in vm if abs(x - med) * 10000 > mad * 44478)
    print(f"mad: median={med / 1e3} mad={mad / 1e3} n_outliers={outl} "
          f"share={r6(outl / len(vm))}")

    # --- events_tail_ratio: values 1..10 -> ranks 5/9/10
    nn = 10
    print(f"tail: p50 rank {(nn + 1) // 2} p90 rank {(9 * nn + 9) // 10} "
          f"p99 rank {(99 * nn + 99) // 100} -> 5.0/9.0/10.0 ratio "
          f"{r6(10000 / 5000)}")

    # --- seasonality_strength: hours 0,1,168,169 counts 3,1,5,1
    ns = [3, 1, 5, 1]
    cellm = {(0): 4.0, (1): 1.0}
    resid = [3 - 4.0, 1 - 1.0, 5 - 4.0, 1 - 1.0]
    def varp(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / len(xs)
    vt, vr = varp(ns), varp(resid)
    print(f"seasonality: var_total={r6(vt)} var_resid={r6(vr)} "
          f"r2={r6(1 - vr / vt)}")

    # --- events_markov + markov_sojourn: u1 view->click->view
    # (gaps 10s, 20s), u2 view->view (5s)
    print("markov: (click,view,1,1.0) (view,click,1,0.5) (view,view,1,0.5)")
    print("sojourn: (click,view) 20.0/20.0 (view,click) 10.0/10.0 "
          "(view,view) 5.0/5.0")


if __name__ == "__main__":
    tranche22()


def tranche23():
    print("\n===== tranche 23: ER, DP, encode, split, causal, cohort =====")
    import hashlib

    def md5h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    # --- er_scores: 4-doc single-block corpus
    # d1/d2 share lang+source+prefix16; d3 differs in source+prefix;
    # d4 differs in lang+prefix.
    W = {"lang": (1.15268, -2.639057), "src": (2.890372, -2.251292),
         "pfx": (6.684612, -1.608437)}
    # d1/d2 (en, web, same prefix); d3 (en, wiki); d4 (de, wiki):
    # asymmetric census so a lang/source field swap cannot cancel.
    pats = {(1, 2): (1, 1, 1), (1, 3): (1, 0, 0), (2, 3): (1, 0, 0),
            (1, 4): (0, 0, 0), (2, 4): (0, 0, 0), (3, 4): (0, 1, 0)}
    for (a, b), (g1, g2, g3) in sorted(pats.items()):
        sc = (W["lang"][1 - g1] + W["src"][1 - g2] + W["pfx"][1 - g3])
        print(f"er ({a},{b}): pat={g1}{g2}{g3} score={r6(sc)}")

    # --- er_em_weights: census of the patterns above, 2 EM iters
    census = {}
    for p in pats.values():
        census[p] = census.get(p, 0) + 1
    lam, m, u = 0.1, [0.9] * 3, [0.1] * 3
    for it in range(2):
        swn = stn = 0
        smn = [0] * 3; sun = [0] * 3
        for (g1, g2, g3), np_ in census.items():
            g = (g1, g2, g3)
            pm = 1.0; pu = 1.0
            for k in range(3):
                pm *= m[k] if g[k] else 1 - m[k]
                pu *= u[k] if g[k] else 1 - u[k]
            w = lam * pm / (lam * pm + (1 - lam) * pu)
            wn = round(w * np_ * 1e6)
            tn = np_ * 1000000
            swn += wn; stn += tn
            for k in range(3):
                if g[k]:
                    smn[k] += wn
                    sun[k] += tn - wn
        lam = swn / stn
        m = [smn[k] / swn for k in range(3)]
        u = [sun[k] / (stn - swn) for k in range(3)]
    for k, name in enumerate(["lang", "source", "prefix16"]):
        lw = math.log(m[k] / u[k]) if m[k] > 0 and u[k] > 0 else None
        print(f"em {name}: m={r6(m[k])} u={r6(u[k])} "
              f"ln_w={r6(lw) if lw is not None else None} lam={r6(lam)}")
        check_far(f"em.m{k}", m[k]); check_far(f"em.u{k}", u[k])

    # --- dp_rr: 12 events, ids 1..12, purchases at ids 1..5
    n_rep = 0
    for eid in range(1, 13):
        y = 1 if eid <= 5 else 0
        truthful = md5h60(str(eid)) < 864691128455135232
        rb = 1 if md5h60(f"{eid}:rr") < 576460752303423488 else 0
        rep = y if truthful else rb
        n_rep += rep
        print(f"rr id={eid}: y={y} truthful={truthful} rb={rb} rep={rep}")
    print(f"rr: n=12 n_true=5 n_reported={n_rep} rate={r6(n_rep / 12)} "
          f"pi_hat={r6((n_rep / 12 - 0.125) / 0.75)} true_rate={r6(5 / 12)}")

    # --- dp_svt: hod counts {0:5, 1:1, 2:8, 3:2}; b=10
    def lap(key, scale):
        uu = (md5h60(key) + 0.5) / 16 ** 15
        cc = uu - 0.5
        return -scale * math.copysign(1, cc) * math.log(1 - 2 * abs(cc))
    q = {0: 5, 1: 1, 2: 8, 3: 2}
    t_exact = sum(q.values()) / len(q)
    t_noisy = t_exact + lap("svt:threshold", 20.0)
    print(f"svt threshold: exact={t_exact} noisy={r6(t_noisy)}")
    prior = 0
    for hod in sorted(q):
        qn = q[hod] + lap(f"svt:q:{hod}", 40.0)
        hit = qn >= t_noisy
        print(f"svt hod={hod}: q_true={q[hod]} q_noisy={r6(qn)} "
              f"evaluated={prior < 3} above={prior < 3 and hit}")
        prior += 1 if hit else 0

    # --- target_encode: priority a orders (10, 20, 60), b (50)
    print(f"encode o1 loo={(20 + 60) / 2} o2 loo={(10 + 60) / 2} "
          f"o3 loo={(10 + 20) / 2} o4 loo=None")

    # --- best_split: F at cents 100,200,300; O at 800,900,1000
    xs = [(100, 1), (200, 1), (300, 1), (800, 0), (900, 0), (1000, 0)]
    mn, mx, n, pos = 100, 1000, 6, 3
    def ent(p, q):
        if p == 0 or p == q:
            return 0.0
        r = p / q
        return -r * math.log(r) - (1 - r) * math.log(1 - r)
    for k in range(1, 10):
        thr = mn + k * (mx - mn) // 10
        nl = sum(1 for x, _ in xs if x <= thr)
        pl = sum(1 for x, y in xs if x <= thr and y == 1)
        gain = ent(pos, n) - nl / n * ent(pl, nl) \
            - (n - nl) / n * ent(pos - pl, n - nl)
        print(f"split k={k} thr={thr}: nl={nl} pl={pl} gain={r6(gain)}")

    # --- markov_accuracy: described in EdgeBranchSpec4 fixture comment
    print("markov_acc: model A->B B->A C->C base=B; test pairs "
          "(A->B ok/ok, B->B miss/ok, C->C ok/miss) -> 2/3 and 2/3, "
          f"acc_bp={2 * 10000 // 3}")

    # --- cohort_ltv: printed in fixture comment
    print("ltv: cohort 1995-01 n=2 k0 rev=40.0 cum=20.0, k1 rev=20.0 "
          "cum=30.0; cohort 1995-02 n=1 k0 rev=40.0 cum=40.0")

    # --- events_did: find user ids per arm via the hash
    def arm(uid):
        return ((uid % 1000000) * 2654435761 + 13) % 1000000 >= 500000
    arms = {uid: arm(uid) for uid in range(1, 11)}
    print(f"did arms 1..10: {arms}")
    treated = [uid for uid, a in arms.items() if a][:2]
    control = [uid for uid, a in arms.items() if not a][:2]
    print(f"treated={treated} control={control}")
    # fixture: pre (ts<=mid): treated values 10,20; control 1,3
    #          post: treated 40,60; control 2,6
    did = (50.0 - 15.0) - (4.0 - 2.0)
    print(f"did: means tp=50.0 tq=15.0 cp=4.0 cq=2.0 did={r6(did)}")

    # --- simpson_check: brand A (1,10),(2,8); brand B (5,30),(6,28)
    # slopes within -200 each; pooled positive.
    pts = [(0.01, 10.0), (0.02, 8.0), (0.05, 30.0), (0.06, 28.0)]
    def slope(ps):
        nn = len(ps)
        sx = sum(p[0] for p in ps); sy = sum(p[1] for p in ps)
        sxy = sum(p[0] * p[1] for p in ps)
        sxx = sum(p[0] ** 2 for p in ps)
        return (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    print(f"simpson: slope_all={r6(slope(pts))} "
          f"slope_A={r6(slope(pts[:2]))} slope_B={r6(slope(pts[2:]))}")

    # --- eval_bootstrap: ids 1..3 values 1,2,3 micro; b=100
    thr = [367879, 735759, 919699, 981012, 996340, 999406]
    def pois(uu):
        for mm, t in enumerate(thr):
            if uu < t:
                return mm
        return 6
    ms = []
    for bb in range(100):
        tot_m = 0; tot_mv = 0
        for eid, v in [(16, 1000000), (39, 2000000), (48, 3000000)]:
            uu = ((eid % 1000000) * 2654435761 + bb * 97 + 13) % 1000000
            mm = pois(uu)
            tot_m += mm; tot_mv += mm * v
        ms.append(tot_mv / (tot_m * 1e6) if tot_m > 0 else None)
    vals = sorted(x for x in ms if x is not None)
    def perc(p):
        r = p * (len(vals) - 1)
        lo, hi = int(math.floor(r)), int(math.ceil(r))
        return vals[lo] + (r - lo) * (vals[hi] - vals[lo])
    print(f"bootstrap: n_resamples=100 n_nonnull={len(vals)} "
          f"lo={r6(perc(.05))} mid={r6(perc(.5))} hi={r6(perc(.95))}")


if __name__ == "__main__":
    tranche23()


def tranche24():
    print("\n===== tranche 24: recommender + token statistics =====")

    # Shared CF fixture: u1 {i1:2, i2:4}, u2 {i1:4, i2:2, i3:6},
    # u3 {i2:2, i3:4}.
    R = {1: {1: 2, 2: 4}, 2: {1: 4, 2: 2, 3: 6}, 3: {2: 2, 3: 4}}

    # --- cf_item_predict: micro cosines, top-10 neighbors, predict
    s2 = {}
    for u, its in R.items():
        for i, q in its.items():
            s2[i] = s2.get(i, 0) + q * q
    dots = {}
    for u, its in R.items():
        for i in its:
            for j in its:
                if i != j:
                    dots[(i, j)] = dots.get((i, j), 0) + its[i] * its[j]
    sims = {k: round(v / (math.sqrt(s2[k[0]]) * math.sqrt(s2[k[1]])) * 1e6)
            for k, v in dots.items() if v > 0}
    print(f"cf sims_u: {sims}")
    se = ae = ns = 0
    for u, its in R.items():
        for i, q in its.items():
            num = den = 0
            for j in its:
                if j != i and (i, j) in sims:
                    num += sims[(i, j)] * its[j]
                    den += sims[(i, j)]
            if den > 0:
                e = num / den - q
                se += round(e * e * 1e6)
                ae += round(abs(e) * 1e6)
                ns += 1
    print(f"cf: n_scored={ns} n_ratings=7 rmse={r6(math.sqrt(se / 1e6 / ns))} "
          f"mae={r6(ae / 1e6 / ns)}")

    # --- slope_one on the same ratings
    devs = {}
    for u, its in R.items():
        for i in its:
            for j in its:
                if i != j:
                    dn, c = devs.get((i, j), (0, 0))
                    devs[(i, j)] = (dn + its[i] - its[j], c + 1)
    se = ae = ns = 0
    for u, its in R.items():
        for i, q in its.items():
            num = den = 0
            for j in its:
                if j != i and (i, j) in devs:
                    dn, c = devs[(i, j)]
                    num += dn + its[j] * c
                    den += c
            if den > 0:
                e = num / den - q
                se += round(e * e * 1e6)
                ae += round(abs(e) * 1e6)
                ns += 1
    print(f"slope_one: n_scored={ns} rmse={r6(math.sqrt(se / 1e6 / ns))} "
          f"mae={r6(ae / 1e6 / ns)}")

    # --- item_decayed_pop: p1 q4@age30 + q2@age0; p2 q10@age60
    t1 = round(math.exp(-30 * math.log(2) / 30) * 4 * 1e9) \
        + round(math.exp(0.0) * 2 * 1e9)
    t2 = round(math.exp(-60 * math.log(2) / 30) * 10 * 1e9)
    print(f"decayed_pop: p1={t1} ({r6(t1 / 1e9)}) p2={t2} ({r6(t2 / 1e9)})")

    # --- user_overlap: u1 {1,2,3}, u2 {2,3,4}, u3 {3}
    print(f"user_overlap: (u1,u2) shared=2 jaccard={r6(2 / 4)}; "
          "(u1,u3)/(u2,u3) shared=1 < minShared -> dropped")

    # --- segment_brand_lift: cells (S1,B1)=2 (S1,B2)=1 (S2,B1)=1
    tot = 4
    for (sg, br, n, rn, cn) in [("S1", "B1", 2, 3, 3), ("S1", "B2", 1, 3, 1),
                                ("S2", "B1", 1, 1, 3)]:
        print(f"lift ({sg},{br}): n={n} lift={r6(n * tot / (rn * cn))}")

    # --- assoc_rules: baskets o1{1,2} o2{1,2} o3{1} o4{1} o5{2}
    print(f"assoc: 1->2 conf={r6(2 / 4)} 2->1 conf={r6(2 / 3)}")

    # --- basket_triples: o1{1,2,3} o2{1,2,3} o3{1,2,4}
    print("triples: (1,2,3) support=2; (1,2,4) filtered at 1")

    # --- token_pmi: 5x'alpha beta', 1x'alpha', 1x'beta gamma',
    # 1x'alpha beta gamma' -> only (alpha,beta) n=6 survives minPair 5
    pmi = math.log(6 * 8 / (7 * 7))
    print(f"pmi (alpha,beta): n_ab=6 df=7/7 nd=8 pmi={r6(pmi)}")
    check_far("pmi", pmi)

    # --- token_dice: 5x'x y z', 2x'y', 2x'x'
    print(f"dice (x,y): c_ab=5 c_x=7 c_y=7 dice={r6(10 / 14)}; "
          f"(y,z): c_y=7 c_z=5 dice={r6(10 / 12)}")

    # --- source_jsd: A='a a b', B='a c c'
    pa = {"a": 2 / 3, "b": 1 / 3}
    pb = {"a": 1 / 3, "c": 2 / 3}
    jsd = 0.0
    for t in sorted(set(pa) | set(pb)):
        p, q = pa.get(t, 0.0), pb.get(t, 0.0)
        m = (p + q) / 2
        term = (p * math.log(p / m) if p > 0 else 0.0) * 0.5 \
            + (q * math.log(q / m) if q > 0 else 0.0) * 0.5
        jsd += term
    print(f"jsd: n_union_toks=3 jsd={r6(jsd)}")
    check_far("jsd", jsd)

    # --- corpus_heaps: 8 docs, checkpoints cut=k
    docs = ["a b", "a c", "a b c d", "a", "e a", "a b e f", "a g",
            "a b c h"]
    toks = [d.split() for d in docs]
    pts = []
    for k in range(1, 9):
        cut = (8 * k + 7) // 8
        cum = sum(len(t) for t in toks[:cut])
        vocab = len({w for t in toks[:cut] for w in t})
        xn = round(math.log(cum) * 1e6)
        yn = round(math.log(vocab) * 1e6)
        pts.append((k, cut, cum, vocab, xn, yn))
        print(f"heaps k={k}: cut={cut} cum_tokens={cum} vocab={vocab}")
    m_ = len(pts)
    sx = sum(p[4] for p in pts); sy = sum(p[5] for p in pts)
    sxy = sum(p[4] * p[5] for p in pts)
    sxx = sum(p[4] * p[4] for p in pts)
    beta = (m_ * sxy - sx * sy) / (m_ * sxx - sx * sx)
    kc = math.exp((sy - beta * sx) / m_ / 1e6)
    print(f"heaps fit: beta={r6(beta)} k_coef={r6(kc)}")
    check_far("heaps.b", beta); check_far("heaps.k", kc)


if __name__ == "__main__":
    tranche24()


def tranche25():
    print("\n===== tranche 25: embeddings + preprocessing + Neyman =====")

    # Embedding fixture: (1,[1,0],a) (2,[3,0],a) (3,[0,2],b)
    # (4,[0,4],b) (5,[2,2],a)
    E = {1: ([1.0, 0.0], "a"), 2: ([3.0, 0.0], "a"), 3: ([0.0, 2.0], "b"),
         4: ([0.0, 4.0], "b"), 5: ([2.0, 2.0], "a")}

    # --- vec_mean_pool
    for lab in ("a", "b"):
        vs = [v for v, l in E.values() if l == lab]
        mp = [r6(sum(v[d] for v in vs) / len(vs)) for d in range(2)]
        print(f"mean_pool {lab}: {mp}")

    # --- label_inertia
    for lab in ("a", "b"):
        vs = [v for v, l in E.values() if l == lab]
        c = [sum(v[d] for v in vs) / len(vs) for d in range(2)]
        sse = sum((v[d] - c[d]) ** 2 for v in vs for d in range(2))
        print(f"inertia {lab}: n={len(vs)} sse={r6(sse)} "
              f"avg={r6(sse / len(vs))}")

    # --- knn_classify: query vec 5, corpus 1-4, k=5 (all), vote tie->a
    q = E[5][0]
    d2 = {i: r6(sum((E[i][0][d] - q[d]) ** 2 for d in range(2)))
          for i in range(1, 5)}
    print(f"knn d2={d2} votes a=2 b=2 -> tie -> pred 'a' votes=2")

    # --- centroid_classify: quantized 1e4 grid, train 1-4, eval 5
    cents = {"a": ([40000, 0], 2), "b": ([0, 60000], 2)}
    qq = [20000, 20000]
    for lab, (s, n) in cents.items():
        num = sum((qq[d] * n - s[d]) ** 2 for d in range(2))
        print(f"centroid {lab}: dist2={num / n / n}")
    print("centroid: pred a (4e8 < 5e8) -> cell (a, a, 1)")

    # --- vec_quantize: per-vec 255-grid affine codes
    for i, (v, _) in sorted(E.items()):
        mn, mx = min(v), max(v)
        sc = 1.0 if mx == mn else (mx - mn) / 255.0
        codes = [round((x - mn) / sc) for x in v]
        print(f"quantize {i}: codes={codes} sum={sum(codes)} "
              f"ssq={sum(c * c for c in codes)}")

    # --- emb_covariance: q = v*1e4; n=5
    qs = [[round(x * 1e4) for x in v] for v, _ in
          (E[i] for i in sorted(E))]
    n = len(qs)
    s = [sum(q[d] for q in qs) for d in range(2)]
    g = [[sum(q[i] * q[j] for q in qs) for j in range(2)] for i in range(2)]
    for i in range(2):
        for j in range(i, 2):
            cov = (g[i][j] - s[i] * s[j] / n) / (n - 1) / 1e8
            print(f"cov ({i},{j}) = {r6(cov)}")

    # --- emb_anisotropy
    ssum = sum(x * x for x in s)
    ssq = g[0][0] + g[1][1]
    print(f"anisotropy: rms={r6(math.sqrt(ssq / n) / 1e4)} "
          f"aniso={r6(ssum / (n * ssq))}")

    # --- vec_profile
    for lab in ("a", "b"):
        vs = [v for v, l in E.values() if l == lab]
        nrm = sorted(math.sqrt(sum(x * x for x in v)) for v in vs)
        mean = sum(nrm) / len(nrm)
        mid = (len(nrm) - 1) * 0.5
        med = nrm[int(mid)] + (mid - int(mid)) * (
            nrm[min(int(mid) + 1, len(nrm) - 1)] - nrm[int(mid)])
        nz = max(sum(1 for x in v if x == 0.0) for v in vs)
        print(f"profile {lab}: n={len(vs)} mean={r6(mean)} med={r6(med)} "
              f"max_zero={nz}")

    # --- quantile_norm: type x=[1,5], y=[2,4,6]; pooled 1,2,4,5,6
    print("qnorm: (x,1)->1.0 (x,5)->6.0 (y,2)->1.0 (y,4)->4.0 (y,6)->6.0")

    # --- winsorize: type t values 1..10, P5=1.45 P95=9.55
    print(f"winsorize: P5={1 + 0.05 * 9} P95={1 + 0.95 * 9} "
          "-> 1->1.45, 10->9.55, rest unchanged")

    # --- zscore: t [2,4,6] -> -1,0,1; z [5,5] -> null
    print("zscore: t values 2,4,6 -> -1.0/0.0/1.0; zero-var type null")

    # --- robust_scale: t [1,2,3,4,100] med=3 mad=1
    for v in (1, 2, 3, 4, 100):
        print(f"robust v={v}: r={r6((v - 3) / 1.4826)}")

    # --- sample_neyman: nation cents {1:[100,300], 2:[500,500],
    # 3:[0,600]}; x = round(sqrt(n*ssq - s^2)) = n*sd_pop
    strata = {1: [100, 300], 2: [500, 500], 3: [0, 600]}
    xs = {}
    for k_, cs in strata.items():
        nn, ss, ssq2 = len(cs), sum(cs), sum(c * c for c in cs)
        xs[k_] = round(math.sqrt(nn * ssq2 - ss * ss))
    tot = sum(xs.values())
    for k_, x in xs.items():
        print(f"neyman nation {k_}: x={x} quota={500 * x // tot}")


if __name__ == "__main__":
    tranche25()


def tranche26():
    print("\n===== tranche 26: conformal, SESD, rolling corr, inventory, "
          "sketches =====")
    import hashlib

    def md5h60(s_):
        return int(hashlib.md5(s_.encode()).hexdigest()[:15], 16)

    # --- conformal_interval: 36 events, v = ((i*7) % 36) + 1 in rank
    # order; split 18/9/9.
    vs = [((i * 7) % 36) + 1 for i in range(1, 37)]
    train, calib, test = vs[:18], vs[18:27], vs[27:]
    ntr, smu = len(train), sum(train)
    res = sorted(abs(v * ntr - smu) for v in calib)
    qr = math.ceil((len(calib) + 1) * 0.9)
    q = res[qr - 1]
    cov = sum(1 for v in test if abs(v * ntr - smu) <= q)
    print(f"conformal: n_train={ntr} mu={r6(smu / ntr)} n_calib={len(calib)} "
          f"q_rank={qr} half_width={r6(q / ntr)} "
          f"coverage={r6(cov / len(test))} n_test={len(test)}")

    # --- events_sesd: cell (dow,hod0) hours 0/168/336 counts 3,5,10;
    # cell hod1 hours 1/169/337 counts 2,2,2.
    series = {0: 3, 168: 5, 336: 10, 1: 2, 169: 2, 337: 2}
    cells = {0: [0, 168, 336], 1: [1, 169, 337]}
    r = {}
    for hod, hrs in cells.items():
        mean = sum(series[h] for h in hrs) / len(hrs)
        for h in hrs:
            r[h] = round((series[h] - mean) * 1e9)
    for k in range(1, 4):
        m = len(r)
        sr = sum(r.values())
        srr = sum(x * x for x in r.values())
        devs = {h: abs(x * m - sr) for h, x in r.items()}
        pick = min(devs, key=lambda h: (-devs[h], h))
        var = (m * srr - sr * sr) / m / (m - 1) if m > 1 else 0
        g = (devs[pick] / m) / math.sqrt(var) if var > 0 else None
        print(f"sesd round {k}: hour={pick} n={series[pick]} "
              f"g={r6(g) if g else None}")
        del r[pick]

    # --- events_rolling_corr: click i, purchase (i*i)%7+1 over h=1..25
    ck = {h: h for h in range(1, 26)}
    pu = {h: (h * h) % 7 + 1 for h in range(1, 26)}
    for end in (24, 25):
        hs = list(range(end - 23, end + 1))
        xa = [ck[h] for h in hs]; xb = [pu[h] for h in hs]
        sx, sy = sum(xa), sum(xb)
        sxy = sum(a * b for a, b in zip(xa, xb))
        sxx = sum(a * a for a in xa); syy = sum(b * b for b in xb)
        num = 24 * sxy - sx * sy
        rr = num / math.sqrt((24 * sxx - sx * sx) * (24 * syy - sy * sy))
        print(f"rolling_corr h={end}: r={r6(rr)}")
        check_far(f"rc{end}", rr)

    # --- dq_metric_drift: days (rows, users) = (4,2), (5,2), (2,1)
    print("dq_drift: d0 nulls; d1 rows_drift 5*1>4 T users 5*0>2 F; "
          "d2 rows 5*3>5 T users 5*1>2 T; null_drift F (0 vs 0)")

    # --- newsvendor + xyz on the weekly-demand fixture
    parts = {1: {0: 1, 1: 2, 2: 3, 3: 4, 4: 10}, 2: {2: 7},
             3: {0: 5, 3: 9}, 4: {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}}
    w = 5
    for p, wk in sorted(parts.items()):
        ds = sorted(wk.values())
        target = (4 * w + 4) // 5 - (w - len(ds))
        stock = ds[target - 1] if 1 <= target <= len(ds) else 0
        sq = sum(wk.values()); sqq = sum(d * d for d in wk.values())
        cv = math.sqrt(w * sqq - sq * sq) / sq
        xyz = "X" if cv <= 0.5 else ("Y" if cv <= 1.0 else "Z")
        print(f"part {p}: target={target} stock={stock} cv={r6(cv)} "
              f"xyz={xyz} active={len(ds)}")

    # --- logbin_quantiles: micro values [1,2,3,8,16]
    print("logbin: buckets 0,1,1,3,4 -> bucket_p50=1 est=3e-6 "
          "exact=0.000003 certified=true")

    # --- sketch_bottomk: type big users 1..20, small users 1..3
    hs = sorted(md5h60(str(u)) for u in range(1, 21))
    hk = hs[15]
    est = 15.0 * 1152921504606846976.0 / hk
    err = round(abs(est - 20) / 20 * 10000)
    print(f"bottomk big: h_k={hk} est={r6(est)} err_bp={err}")
    hs3 = sorted(md5h60(str(u)) for u in range(1, 4))
    print(f"bottomk small: n_sk=3 < 16 -> est=3.0 err_bp=0 h_k={hs3[-1]}")

    # --- heavy_hitters / cm_sketch corpus: 'aa'x4 'bb'x2 'cc' 'dd'
    toks = ["aa"] * 4 + ["bb"] * 2 + ["cc", "dd"]
    # cm buckets, depth 4 width 256
    buckets = {}
    for t in set(toks):
        for rr_ in range(4):
            buckets.setdefault((rr_, md5h60(f"{rr_}:{t}") % 256), []).append(t)
    coll = {k: v for k, v in buckets.items() if len(v) > 1}
    print(f"cm collisions: {coll if coll else 'none -> n_est == n_exact'}")
    # heavy hitters phi=0.02 on N=8 -> threshold ceil(0.16)=1: all 4.
    print("hh on this corpus: threshold 1 -> all tokens qualify")


if __name__ == "__main__":
    tranche26()


def tranche27():
    print("\n===== tranche 27: text gates, drift timeline, retention =====")

    # --- text_quality: len/punct/stopword composite
    # doc1: 'the cat, and the dog sat.' -> len 26? count precisely below
    docs = {
        1: "the cat, and the dog sat.",
        2: "x" * 250,
        3: "!!! ??? ...",
    }
    stop = {"the", "a", "an", "and", "of", "to", "in", "is", "it",
            "that", "for"}
    import re
    for d, t in sorted(docs.items()):
        n = max(len(t), 1)
        toks = max(len(re.findall(r"\S+", t)), 1)
        punct = len(re.findall(r"[^A-Za-z0-9\s]", t))
        stops = len(re.findall(
            r"\b(?:the|a|an|and|of|to|in|is|it|that|for)\b", t.lower()))
        ls = min(n / 200.0, 1.0)
        ps = max(1.0 - punct / n * 4.0, 0.0)
        ss = min(stops / toks * 5.0, 1.0)
        q = (ls + ps + ss) / 3.0
        print(f"quality {d}: n={n} toks={toks} punct={punct} stops={stops} "
              f"q={r6(q)}")
        check_far(f"q{d}", q)

    # --- doc_readability on doc1
    t = docs[1]
    w = len(re.findall(r"\S+", t))
    sents = max(len(re.findall(r"[^.!?]*[.!?]", t)), 1)
    syl = len(re.findall(r"[aeiouy]+", t.lower()))
    fl = 206.835 - 1.015 * w / sents - 84.6 * syl / w
    print(f"readability 1: w={w} s={sents} syl={syl} "
          f"flesch={round(fl, 4)}")

    # --- text_diversity on 'aa bb aa cc' and 'zz'
    print("diversity: doc (aa bb aa cc): n_tokens=4 n_types=3 ttr=0.75 "
          "hapax=0.5; doc (zz): 1/1/1.0/1.0")

    # --- lm_vocab: corpus 'a a a a a b' + 'a b c' (minCount 5)
    print(f"lm_vocab: only 'a' kept: n=6 total=9 logp={r6(math.log(6 / 9))}")

    # --- vocab_drift: bigram 'a b' x3 first half, x2 second; totals
    # first 4, second 4 (pad with other bigrams).
    a, b_, ta, tb = 3, 2, 4, 4
    lor = math.log((a + .5) / (ta - a + .5)) - math.log((b_ + .5) / (tb - b_ + .5))
    se = math.sqrt(1 / (a + .5) + 1 / (ta - a + .5) + 1 / (b_ + .5)
                   + 1 / (tb - b_ + .5))
    print(f"vocab_drift 'a b': lor={r6(lor)} z={r6(lor / se)}")
    check_far("vd", lor / se)

    # --- funnel_ttc: u1 view@0 click@+30m purchase@+2h(in 24h window);
    # u2 view@0 click@+2h (outside 1h) -> not counted; u3 view only.
    print("funnel_ttc: n_view=3 n_click_1h=1 avg_view_click_s=1800.0 "
          "n_purchase_24h=1 avg_click_purchase_s=5400.0")

    # --- retention_dayn: users {1: days 0,1,3}, {2: days 0}; maxd=3
    ud = {1: [0, 1, 3], 2: [0]}
    maxd = 3
    for off in range(1, 8):
        base = sum(1 for u, ds in ud.items() for d in ds if d + off <= maxd)
        ret = sum(1 for u, ds in ud.items() for d in ds if d + off in ds)
        if base:
            print(f"retention off={off}: base={base} retained={ret} "
                  f"r={r6(ret / base)}")

    # --- dau_mau: same activity; window 28d covers everything
    days = sorted({d for ds in ud.values() for d in ds})
    for day in days:
        dau = sum(1 for ds in ud.values() if day in ds)
        mau = sum(1 for ds in ud.values()
                  if any(day - 27 <= d <= day for d in ds))
        print(f"dau_mau day={day}: dau={dau} mau={mau} "
              f"bp={dau * 10000 // mau}")

    # --- drift_timeline: values day0 [0,10] (ref), day1 [0,0,10],
    # day2 [10,10]; range 0..10, bins v==0 -> 0, v==10 -> 9.
    ref = {0: 1, 9: 1}; nr = 2
    for day, binc in [(1, {0: 2, 9: 1}), (2, {9: 2})]:
        nd = sum(binc.values())
        psi_nn = 0
        for bb in range(10):
            pd_ = (binc.get(bb, 0) + 0.5) / (nd + 5.0)
            pr_ = (ref.get(bb, 0) + 0.5) / (nr + 5.0)
            psi_nn += round((pd_ - pr_) * math.log(pd_ / pr_) * 1e9)
        print(f"drift day={day}: n={nd} psi={r6(psi_nn / 1e9)} "
              f"drifted={psi_nn >= 200000000}")

    # --- events_seasonal_anomaly: same cells as sesd fixture
    series = {0: 3, 168: 5, 336: 10, 1: 2, 169: 2, 337: 2}
    cells = {0: [0, 168, 336], 1: [1, 169, 337]}
    resid = {}
    for hod, hrs in cells.items():
        mean = sum(series[h] for h in hrs) / len(hrs)
        for h in hrs:
            resid[h] = series[h] - mean
    m = len(resid)
    mu = sum(resid.values()) / m
    sd = math.sqrt(sum((x - mu) ** 2 for x in resid.values()) / (m - 1))
    for h in sorted(resid, key=lambda h: (-abs(resid[h] / sd), h))[:5]:
        print(f"anomaly h={h}: n={series[h]} "
              f"expected={r6(series[h] - resid[h])} "
              f"z={round(resid[h] / sd, 4)}")


if __name__ == "__main__":
    tranche27()


def tranche28():
    print("\n===== tranche 28: sampling, fingerprints, packing =====")
    import hashlib

    def md5hex(s_):
        return hashlib.md5(s_.encode()).hexdigest()

    def md5h60(s_):
        return int(md5hex(s_)[:15], 16)

    def ah(key, seed):
        return ((key % 1000000) * 2654435761 + seed)

    # --- text_fingerprint: md5 of ws-collapsed lowercased trim
    import re
    for d, t in [(1, "  Hello   World "), (2, "a\tb\nc")]:
        norm = re.sub(r"\s+", " ", t.strip().lower())
        print(f"fingerprint {d}: '{norm}' -> {md5hex(norm)}")

    # --- table_checksum: docs (1,'x a','en','web',10), (2,'y','en',
    # 'wiki',20), (3,'z','de','web',30); 60-bit row md5 over
    # 'doc_id|text|lang|source|n_chars', xor per lang
    rows = [(1, "x a", "en", "web", 10), (2, "y", "en", "wiki", 20),
            (3, "z", "de", "web", 30)]
    xors = {}
    for r_ in rows:
        h = md5h60("|".join(str(x) for x in r_))
        xors[r_[2]] = xors.get(r_[2], 0) ^ h
    for lang, x in sorted(xors.items()):
        print(f"checksum {lang}: {x}")

    # --- cv_folds: fold = md5(user) % 5 for users 1..10
    folds = {}
    for u in range(1, 11):
        folds.setdefault(md5h60(str(u)) % 5, []).append(u)
    for f_, us in sorted(folds.items()):
        print(f"cv fold {f_}: users={us} n={len(us)}")

    # --- domain_cap: source A doc_ids 1..35 keep 30 by (md5(id), id);
    # source B 36..40 all kept
    order = sorted(range(1, 36), key=lambda i: (md5hex(str(i)), i))
    kept = sorted(order[:30])
    dropped = sorted(order[30:])
    print(f"domain_cap A: dropped={dropped} kept_sum={sum(kept)}")

    # --- class_rebalance: types a x5 (ids 1-5), b x2 (ids 6-7);
    # target 2; order by (ah(id,77) % 1e6, id)
    a_order = sorted(range(1, 6), key=lambda i: (ah(i, 77) % 1000000, i))
    print(f"class_rebalance: kept a={sorted(a_order[:2])} b=[6, 7]")

    # --- corpus_shuffle: ids straddling the 1e6 modulus so the
    # mod-FIRST hash actually permutes (a plain monotone hash would
    # return ingest order and pin nothing)
    ids = [1000002, 999999, 3, 1000001, 500000]
    sh = sorted(ids, key=lambda i: (ah(i, 7), i))
    print(f"shuffle order: {sh}")

    # --- sample_hash: events ids 1..20, keep (ah(id,42) % 1e6) < 250000
    keep = [i for i in range(1, 21) if ah(i, 42) % 1000000 < 250000]
    print(f"sample_hash kept: {keep}")

    # --- sample_stratified: nation 1 custs 1..12, quota 10 by
    # (ah(c,7) % 1e6, c)
    so = sorted(range(1, 13), key=lambda c: (ah(c, 7) % 1000000, c))
    print(f"stratified dropped: {sorted(so[10:])}")

    # --- sample_temperature: nation 1 custs 1..200, nation 2 201..300;
    # w = floor(sqrt(cnt)) -> 14, 10; quotas 300*14 div 24 = 175,
    # 300*10 div 24 = 125, deficit 0
    print("temperature: quotas n1=175 n2=125 (rem 0, no top-up)")
    for nk, ids in [(1, range(1, 201)), (2, range(201, 301))]:
        quota = 175 if nk == 1 else 125
        sel = sorted(ids, key=lambda c: (ah(c, 11) % 1000000, c))[:quota]
        print(f"  nation {nk}: n_kept={len(sel)} sum={sum(sel)}")

    # --- pack_budget: budget 2000, 8 buckets, bucket = ah(id,3) % 8
    # (2654435761 % 8 = 1 so ids 1/9/17 share bucket 4 -> the second
    # bin opens at cum 2700)
    docs = {1: 1200, 9: 1500, 17: 900, 4: 700}
    buckets = {}
    for d in sorted(docs):
        buckets.setdefault(ah(d, 3) % 8, []).append(d)
    for bkt, ds in sorted(buckets.items()):
        cum = 0
        for d in ds:
            binno = (cum) // 2000
            print(f"pack doc {d}: bucket={bkt} bin={binno} "
                  f"n_tokens={docs[d]}")
            cum += docs[d]


if __name__ == "__main__":
    tranche28()


def tranche29():
    print("\n===== tranche 29: intervals, windows, sweeps =====")
    import datetime as dt

    # --- interval_coalesce: u1 intervals [0,600s],[300,900s],
    # [900,1200s] (touching MERGES), [2000,2060s]
    print("coalesce u1: island [0, 1200e6] n=3; island [2000e6, 2060e6] n=1")

    # --- interval_intersect: u1 session 23:50d0 .. 00:10d1 (+1us end)
    print("intersect: day0 overlap 600000000us; day1 600000001us")

    # --- events_moving_avg: ts 0/1800/3600/7201s values 2/4/6/8
    print("moving_avg: n/avg = (1,2.0) (2,3.0) (3,4.0) (1,8.0) — the 1h "
          "range bound is INCLUSIVE at exactly -3600s")

    # --- events_gapfill: a h0 (2 ev avg 5), h2 (1 ev avg 7); b h1 (3.0)
    print("gapfill a: (0,2,5.0) (1,0,5.0 ffill) (2,1,7.0); "
          "b: (0,0,null) (1,1,3.0) (2,0,3.0)")

    # --- events_streaks: counts [5,5,1,5,1,1] -> above mean hours
    # 0,1,3 -> streaks 2 and 1
    print("streaks: longest=2 n_streaks=2")

    # --- events_debounce: gaps 1800s (flag), 5400s (keep), exactly
    # 3600s (flag — kept requires gap STRICTLY > min)
    print("debounce flagged: id2 gap=1800000000, id4 gap=3600000000")

    # --- events_heatmap
    print("heatmap: (4,0,2,0.666667) (5,3,1,0.333333)")

    # --- events_percentile_series: day0 t values 1..5
    print(f"percentiles: p10={1 + 0.1 * 4} p50=3.0 p90={1 + 0.9 * 4}")

    # --- skyline_parts: (pc,size,id,n): strict prefix-min sweep
    print("skyline: (1.0,5,1,1) (2.0,3,2,1) (4.0,2,5,2); "
          "(3.0,3) ties prefix-min -> dropped; (2.0,7) dominated")

    # --- backlog_aging: o1 od day0 ship day200 $10; o2 od day100
    # ship day150 $20; snaps at day 50/100/150
    d0 = dt.date(1970, 1, 1)
    for label, days in [("o2_od", 100), ("o2_ship", 150), ("o1_ship", 200)]:
        print(f"  {label}: {d0 + dt.timedelta(days=days)}")
    print("backlog: snap1 (1_30_to_90d,1,10.0); snap2 (0_under_30d,1,"
          "20.0)+(2_over_90d,1,10.0); snap3 (2_over_90d,1,10.0)")


if __name__ == "__main__":
    tranche29()


def tranche30():
    print("\n===== tranche 30: planner/layout audits =====")

    # --- join_size_audit: per-edge histograms built so the uniform
    # estimate MISSES: left keys absent from the right side.
    edges = {
        # lineitem_orders: l_orderkey [1,1,1,2], orders [1,3]
        "lineitem_orders": ([1, 1, 1, 2], [1, 3]),
        # lineitem_part: l_partkey [1,2,2,2], part [1,2]
        "lineitem_part": ([1, 2, 2, 2], [1, 2]),
        # lineitem_supplier: l_suppkey all 1, supplier [1]
        "lineitem_supplier": ([1, 1, 1, 1], [1]),
        # orders_customer: o_custkey [1,1], customer [1,2]
        "orders_customer": ([1, 1], [1, 2]),
    }
    for name, (lk, rk) in edges.items():
        ca = {}; cb = {}
        for k in lk: ca[k] = ca.get(k, 0) + 1
        for k in rk: cb[k] = cb.get(k, 0) + 1
        actual = sum(ca[k] * cb.get(k, 0) for k in ca)
        est = len(lk) * len(rk) // max(len(ca), len(cb))
        print(f"jsa {name}: n={len(lk)}x{len(rk)} d={len(ca)}/{len(cb)} "
              f"est={est} actual={actual} "
              f"ratio_bp={est * 10000 // actual}")

    # --- zorder_cells: (value, user) cells at 8 bits
    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z
    pts = [(1, 0.0, 1), (2, 10.0, 1), (3, 5.0, 3)]
    vlo, vhi, ulo, uhi = 0.0, 10.0, 1, 3
    for eid, v, u in pts:
        xc = min(int((v - vlo) * 256 / (vhi - vlo)), 255)
        yc = min(int((u - ulo) * 256 / (uhi - ulo)), 255)
        print(f"zorder {eid}: xcell={xc} ycell={yc} z={morton(xc, yc)}")

    # --- partition_skew: (lang,source,bytes) = (de,web,5) (en,web,30)
    # (en,wiki,50); median rk2 = 30
    for lg, sc, b in [("de", "web", 5), ("en", "web", 30),
                      ("en", "wiki", 50)]:
        print(f"pskew ({lg},{sc}): bytes={b} share={b * 10000 // 50} "
              f"mom={r6(50 / 30)}")

    # --- compaction_plan: cum-exclusive div 65536 over (a,s1,40000)
    # (a,s2,30000) (b,s1,60000)
    print("compaction: (a,s1)->fg0 (a,s2)->fg0 (b,s1)->fg1 (cum 70000)")

    # --- sortkey_advisor / range_partition_plan: printed in the spec
    print("sortkey pos: l_linestatus(1,1) l_returnflag(2,2) "
          "l_shipdate(3,3) l_suppkey(4,4) l_partkey(5,5) l_quantity(6,6)")

    # --- skew_profile: users [1,1,1,2]
    n = 4
    ent = math.log(n) - (3 * math.log(3) + 1 * math.log(1)) / n
    print(f"skew_profile: n=4 keys=2 top=1 frac=0.75 entropy={r6(ent)}")
    check_far("skp", ent)

    # --- broadcast_advisor: one-row dims, est = strlen + n*fixed
    for t, est in [("region", 6 + 4), ("nation", 7 + 8),
                   ("supplier", 2 + 20), ("customer", 2 + 3 + 20),
                   ("part", 5 + 2 + 3 + 20)]:
        print(f"badvisor {t}: est_bytes={est}")

    # --- postings_compression: x in docs 1,2,3 (df 3); y in doc 2
    # gamma bits: x -> first id 1 encodes 2 (3 bits), gaps 1,1 (1 bit
    # each); y -> first id 2 encodes 3 (3 bits)
    gx, gy = 3 + 1 + 1, 3
    raw = 4 * 64
    print(f"postings a_df_1_10: n=4 raw={raw} gamma={gx + gy} "
          f"savings_bp={(raw - gx - gy) * 10000 // raw}")


if __name__ == "__main__":
    tranche30()


def tranche31():
    print("\n===== tranche 31: privacy triple, RI, order stats, OHLC =====")

    # --- t_closeness: nations' (band0) classes vs global segment mix
    # n1: S1x4; n2: S1x1,S2x3; n3: S1x1,S2x1. N=10, g(S1)=6, g(S2)=4.
    base = {1: {"S1": 4}, 2: {"S1": 1, "S2": 3}, 3: {"S1": 1, "S2": 1}}
    g = {}
    for cls in base.values():
        for s_, c in cls.items():
            g[s_] = g.get(s_, 0) + c
    N = sum(g.values())
    for nk, cls in sorted(base.items()):
        n = sum(cls.values())
        tvd = sum(abs(cls.get(s_, 0) * N - g[s_] * n) for s_ in g)
        print(f"tclose nation {nk}: n={n} tvd_num={tvd} "
              f"t={r6(tvd / (2 * n * N))}")

    # --- weighted_median: flag A units (1.0 w1),(2.0 w2),(3.0 w1)
    print("wmedian A: cum 2x at 2.0 -> 6 >= tot 4 -> median 2.0 tot 4.0")

    # --- events_moving_median on C8 = [5,2,4,1,6,3,5,2], window +-3
    C8 = [5, 2, 4, 1, 6, 3, 5, 2]
    for i in range(8):
        arr = sorted(C8[max(0, i - 3):i + 4])
        m = len(arr)
        med = arr[(m + 1) // 2 - 1] if m % 2 == 1 else \
            (arr[m // 2 - 1] + arr[m // 2]) / 2.0
        print(f"movmed h{i}: m={m} med={med}")

    # --- events_peaks: counts [2,2,8,2,2,2,2,2], base 100
    print("peaks: hour 102 n=8 pn=2 nn=2 sum7=18 cnt7=6 mean_7h=3.0 "
          "(8*2*6=96 > 54)")

    # --- events_eqdepth: values 1..10, 8 buckets
    # ntile(8) over 10 rows: buckets 1,2 hold 2 rows
    print("eqdepth: b1 (2,1,2) b2 (2,3,4) b3 (1,5) ... b8 (1,10)")


if __name__ == "__main__":
    tranche31()


def tranche32():
    print("\n===== tranche 32: text-ops family =====")
    import re

    # --- text_stats on 'Ab, c9 x!'
    t = "Ab, c9 x!"
    print(f"text_stats: len={len(t)} ws={len(re.findall(chr(92) + 'S+', t))} "
          f"bpe={len(re.findall('[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]', t))} "
          f"punct={len(re.findall('[^A-Za-z0-9 ]', t))}")

    # --- doc_keywords: d1 'apple apple banana', d2 'banana cherry'
    for d, terms in [(1, {"apple": 2, "banana": 1}),
                     (2, {"banana": 1, "cherry": 1})]:
        df_ = {"apple": 1, "banana": 2, "cherry": 1}
        sc = {w: r6(c * math.log(2 / df_[w])) for w, c in terms.items()}
        ranked = sorted(sc.items(), key=lambda kv: (-kv[1], kv[0]))
        print(f"keywords d{d}: {ranked}")

    # --- text_bm25: d1 'aa aa bb', d2 'bb cc'
    docs = {1: ["aa", "aa", "bb"], 2: ["bb", "cc"]}
    N, dl = 2, {1: 3, 2: 2}
    avgdl = 2.5
    df_ = {"aa": 1, "bb": 2, "cc": 1}
    k1, b = 1.2, 0.75
    for d, ts in docs.items():
        out = []
        for w in sorted(set(ts)):
            tf = ts.count(w)
            idf = math.log(1 + (N - df_[w] + 0.5) / (df_[w] + 0.5))
            s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl[d] / avgdl))
            out.append((w, r6(s)))
            check_far(f"bm25.{d}.{w}", s)
        print(f"bm25 d{d}: {sorted(out, key=lambda kv: (-kv[1], kv[0]))}")

    # --- vocab_coverage: top-1000 cut excludes the two singletons
    print("vocab_coverage: doc3 n_tokens=3 n_oov=2 rate=0.666667")

    # --- doc_sentences: 'One two. Three! four? five'
    segs = [s.strip() for s in re.findall(r"[^.!?]+",
            "One two. Three! four? five") if s.strip()]
    lens = [len(s) for s in segs]
    print(f"sentences: n={len(segs)} lens={lens} mean={r6(sum(lens)/len(lens))} "
          f"max={max(lens)}")

    # --- kwic_snippets: 'vector' at a known offset
    text = "x " * 20 + "vector and more text here for padding purposes"
    pos = text.lower().find("vector") + 1
    snippet = text[max(pos - 30, 1) - 1:][:66]
    print(f"kwic: pos={pos} snippet='{snippet}'")

    # --- text_ngram_repetition: d1 'a b a b a', d2 'x y z'
    print("ngram_rep d1: n_bi=4 top_frac=0.5 n_tri=3 dup_frac=0.666667; "
          "d2: n_bi=2 top_frac=0.5 dup_frac=0.0")

    # --- term_burstiness: 'the' in 20 docs, doubled in 10 -> cf/df 1.5
    print("burstiness: the cf=30 df=20 b=1.5 (only term passing df>=20)")

    # --- langid_confusion: same cells as the kappa fixture
    print("confusion: (de,de,1,5000) (de,fr,1,null) (en,en,1,5000) "
          "(en,und,1,null)")


if __name__ == "__main__":
    tranche32()


def tranche33():
    print("\n===== tranche 33: sessions, attribution, SLO =====")
    # Shared session fixture (30-min gap):
    # u1 A: view@0 click@60 purchase@120 click@180 purchase@240
    # u1 B (day1): view, view+60
    # u2: purchase@0 alone; u3: view@0 alone; u4: view@0 click@30
    print("attribution: (purchase,direct,1) (view,click,2)")
    # positional: conv1 m=2 -> 5000/5000 view/click; conv2 m=4 ->
    # view 4000+2000%2=4000, middles click@60 purchase@120 1000 each,
    # last click@180 4000; u2 pathless -> direct 10000
    print("position: click (3, 10000, 1.0) direct (1, 10000, 1.0) "
          "purchase (1, 1000, 0.1) view (2, 9000, 0.9)")
    # view-entry sessions: u1A (5 ev), u1B (2), u3 (1 -> bounce),
    # u4 (2) -> 4 sessions 1 bounce; purchase-entry: u2 alone.
    print("bounce: purchase (1, 1, 1.0); view (4, 1, 0.25)")
    print("churn: d0 (0 new=4 churned=0) d1 (retained 1 new 0 churned 3) "
          "d2 (0, 0, 1)")
    print("cumulative: d0 new=4 cum=4; d1 new=0 cum=4")
    print("concurrency: day0 peak=4 starts=4; day1 peak=1 starts=1")

    # --- slo_burn: h0 9 errors of 10; h1 1 of 10
    print(f"slo h0: burn1={r6(9 * 20 / 10)} burn6={r6(9 * 20 / 10)} "
          "page=True ticket=True")
    print(f"slo h1: burn1={r6(1 * 20 / 10)} burn6={r6(10 * 20 / 20)} "
          "page=False ticket=False")

    # --- watermark_audit: arrivals ts 0, 7200s, 3600s, 7100s
    print("watermark: delay60 late=2 bp=5000; delay600 late=1 bp=2500; "
          "delay3600 late=0 bp=0 (boundary is STRICT >)")

    # --- fanout_profile
    print("fanout: (0,1) (1,1) (2,1)")


if __name__ == "__main__":
    tranche33()


def tranche34():
    print("\n===== tranche 34: business rollups =====")
    # revenue_growth: months 199501..199512 = $1..$12, 199601 = $24
    print("growth: 199502 mom=1.0; 199512 mom=" + str(r6(12 / 11 - 1)) +
          "; 199601 mom=1.0 yoy=23.0; 199501 mom/yoy null")
    # lead_time priority a: days 1, 3
    print(f"lead: mean=2.0 p50=2.0 p90={1 + 0.9 * 2} p99={r6(1 + 0.99 * 2)}")
    # seasonal index: cells 9501 $10, 9502 $20, 9601 $40, 9602 $10
    print("seasonal: mon1 idx=(5000*4)/(2*8000)=1.25 mon2=0.75")
    # single_source_risk: p1 (9,1) share 9000; p3 tie (3,3) -> s1 5000
    print("risk: p1 s1 9000bp; p3 s1 5000bp (tie to lower suppkey); "
          "p2 single-sourced filtered")
    # rfm_migration cells
    print("rfm_mig: (0,3,c5) (1,2,c1) (2,1,c2) (3,0,c3) (4,0,c4)")


if __name__ == "__main__":
    tranche34()


def tranche35():
    print("\n===== tranche 35: inequality curve, shares, anomalies =====")

    # revenue_lorenz: customer cents 1000/2000/3000/4000
    cents = [1000, 2000, 3000, 4000]
    tot = sum(cents)
    cum = 0
    for rk, c in enumerate(sorted(cents), 1):
        cum += c
        dec = rk * 10 // 4
        print(f"lorenz rk={rk}: decile={dec} cum_share={r6(cum / tot)}")

    # market_share: promo cents nat7=100, other-nation=200
    print(f"mkt: 1995 total=3.0 share={r6(100 / 300)}")

    # events_anomaly: 11 hours of 2 + one hour of 20
    ns = [2] * 11 + [20]
    m = sum(ns) / len(ns)
    sd = math.sqrt(sum((x - m) ** 2 for x in ns) / (len(ns) - 1))
    print(f"anomaly: mean={m} sd={r6(sd)} z2={r6((2 - m) / sd)} "
          f"z20={r6((20 - m) / sd)} anomaly={abs((20 - m) / sd) > 3}")

    # corpus_chi2: grid (en,web)4 (en,wiki)2 (de,web)2 (de,wiki)2
    obs = {("en", "web"): 4, ("en", "wiki"): 2, ("de", "web"): 2,
           ("de", "wiki"): 2}
    rt = {"en": 6, "de": 4}; ct = {"web": 6, "wiki": 4}; n = 10
    chi2 = sum((o - rt[l] * ct[s_] / n) ** 2 / (rt[l] * ct[s_] / n)
               for (l, s_), o in obs.items())
    print(f"chi2={r6(chi2)} dof=1")

    # events_regression/corr: (tod h, value) = (1,2) (2,4) (3,6)
    print("regression: slope=2.0 intercept=0.0 r2=1.0; corr=1.0 "
          "covar=2.0 sd_value=2.0")

    # benford_digit2: cents 100 (d2 0), 123 (2), 250 (5); 5 filtered
    for d in (0, 2, 5):
        p = sum(math.log10(1 + 1 / (10 * d1 + d)) for d1 in range(1, 10))
        t = (1 / 3 - p) ** 2 / p * 3
        print(f"benford2 d={d}: p={r6(p)} share={r6(1 / 3)} chi2={r6(t)}")
        check_far(f"b2.{d}", p)


if __name__ == "__main__":
    tranche35()


def tranche36():
    print("\n===== tranche 36: coverage, interarrival, incremental =====")
    # catalog_coverage: brand B1 parts {1,2,3} with 1 never-ordered;
    # brand B2 part {4} never-ordered at all
    print(f"coverage: B1 n=3 never=1 cov={r6(2 / 3)}; B2 n=1 never=1 cov=0.0")
    # events_interarrival: type t gaps 10s, 30s
    print(f"interarrival: n_gaps=2 mean={r6((10e6 + 30e6) / 2)} "
          f"p50={r6(20e6)} p90={r6(10e6 + 0.9 * 20e6)}")
    # agg_incremental: base (80%) + delta (20%) merged == direct agg
    print("agg_incremental: type t n=5 sum=15.0 (merge == direct)")


if __name__ == "__main__":
    tranche36()


def tranche37():
    print("\n===== tranche 37: pico-graph topology (diameter/bridges/"
          "truss/harmonic) =====")

    # graph_diameter: co-purchase path P5 (edges 1-2,2-3,3-4,4-5; each
    # edge = 2 two-part orders, so coocPairs keeps all at n_ab=2).
    # Double-sweep: start = min vertex 1; BFS-4 reaches all 5 vertices
    # (dist 0..4); farthest = 5; re-BFS from 5 has eccentricity 4.
    print("diameter P5: start=1 peripheral=5 ecc_lower=4 "
          "n_reach_1=5 n_reach_2=5")

    # graph_bridges: triangle {1,2,3} + path 3-4-5. A local bridge is
    # an edge whose endpoints share no common neighbor:
    #   (1,2),(1,3),(2,3) each close the triangle -> not bridges;
    #   (3,4): N(3)={1,2,4}, N(4)={3,5}, disjoint -> bridge;
    #   (4,5): N(4)={3,5}, N(5)={4}, disjoint -> bridge.
    # Degrees: deg(3)=3, deg(4)=2, deg(5)=1.
    print("bridges: (3,4) deg_a=3 deg_b=2; (4,5) deg_a=2 deg_b=1")

    # graph_ktruss (3-truss, 3 unrolled peels): bowtie sharing edge
    # (2,3) -- edges (1,2),(1,3),(2,3),(2,4),(3,4) -- plus pendant
    # (4,5). Supports round 1: pendant closes no triangle -> dropped;
    # every bowtie edge survives all 3 rounds. Final recomputed
    # supports: (2,3) sits on both triangles {1,2,3},{2,3,4} -> 2;
    # the other four edges sit on one each -> 1.
    print("ktruss: (1,2)=1 (1,3)=1 (2,3)=2 (2,4)=1 (3,4)=1; "
          "(4,5) peeled")

    # graph_harmonic (3-hop, micro-weights 1e6/5e5/333333) on the
    # cosine path P5: unit vectors at angles 0/60/120/180/240 degrees
    # give cos=0.5 for consecutive pairs (edge at threshold 0.35) and
    # cos<=-0.5 otherwise (no edge).
    import math as _m
    for i in range(5):
        for j in range(i + 1, 5):
            c = _m.cos(_m.radians(60 * (j - i)))
            edge = c >= 0.35
            assert edge == (j - i == 1), (i, j, c)
    prof = {1: (1, 1, 1), 2: (2, 1, 1), 3: (2, 2, 0), 4: (2, 1, 1),
            5: (1, 1, 1)}
    for v, (n1, n2, n3) in sorted(prof.items()):
        h = (n1 * 1_000_000 + n2 * 500_000 + n3 * 333_333) / 1e6
        print(f"harmonic v={v}: n1={n1} n2={n2} n3={n3} h={r6(h)}")


if __name__ == "__main__":
    tranche37()
