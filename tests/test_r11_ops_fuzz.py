"""r11 randomized replays: the portable MinHash/LSH pipeline and the
portable md5 RNG stream, each against a from-scratch python oracle on
random inputs (the r10 fuzz convention — no shared code with the
implementations)."""

from __future__ import annotations

import hashlib
import math
import random

from pyspark.sql import functions as F

from data_integration_est_spark import rng
from data_integration_est_spark.ops.dedup import minhash_signatures_portable

M48 = 1 << 48
MASK53 = (1 << 53) - 1
TWO53 = float(1 << 53)

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon").split()


def _rand_text(r: random.Random) -> str:
    n = r.randint(0, 12)
    return " ".join(r.choice(WORDS) for _ in range(n))


def _py_sig(text: str, k: int) -> list[int]:
    toks = text.strip().split() if text.strip() else [""]
    if len(toks) >= 3:
        grams = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
    else:
        grams = {text.strip()}
    out = []
    for i in range(k):
        best = None
        for g in grams:
            hx = hashlib.md5(g.encode()).hexdigest()
            v = (int(hx[0:12], 16) + i * int(hx[16:28], 16)) % M48
            best = v if best is None else min(best, v)
        out.append(best)
    return out


def test_minhash_portable_fuzz_vs_python(spark):
    r = random.Random(411)
    for k in (4, 16):
        docs = [(i, _rand_text(r)) for i in range(120)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            row["doc_id"]: list(row["minhash"])
            for row in minhash_signatures_portable(df, num_hashes=k).collect()
        }
        for doc_id, text in docs:
            assert got[doc_id] == _py_sig(text, k), (k, doc_id, text)


def test_md5_stream_fuzz_vs_hashlib(spark):
    """uniform(stream='md5') == the documented hash algebra, and
    normal() == Box-Muller over the two tagged uniforms."""
    r = random.Random(412)
    keys = sorted({(r.randint(1, 50), r.randint(1, 10_000))
                   for _ in range(200)})
    df = spark.createDataFrame(keys, "sim_id long, uid long")
    out = {
        (row["sim_id"], row["uid"]): (row["u"], row["z"])
        for row in df.select(
            "sim_id", "uid",
            rng.uniform(["sim_id", "uid"], 77, "t", stream="md5").alias("u"),
            rng.normal(["sim_id", "uid"], 77, "n", mean=1.5, sd=2.0,
                       stream="md5").alias("z"),
        ).collect()
    }

    def u_of(sim, uid, tag):
        raw = f"{sim}\x1f{uid}\x1f77:{tag}".encode()
        h = int(hashlib.md5(raw).hexdigest()[0:15], 16)
        return ((h & MASK53) + 0.5) / TWO53

    for sim, uid in keys:
        u, z = out[(sim, uid)]
        assert u == u_of(sim, uid, "t"), (sim, uid)
        u1, u2 = u_of(sim, uid, "n.bm1"), u_of(sim, uid, "n.bm2")
        zz = 1.5 + 2.0 * math.sqrt(-2.0 * math.log(u1)) * math.cos(
            2.0 * math.pi * u2
        )
        assert abs(z - zz) < 1e-12, (sim, uid)
