"""Dump the compiled HLO of the SD UNet forward (scan regime) and print the
definitions of named fusions — for mapping trace op names (fusion.NNNN,
convolution_add_fusion.NN) to actual computations.

  python scripts/dump_hlo.py [fusion.2299 convolution_add_fusion.73 ...]
"""

import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from superdiff_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

B = 24
K = 10


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel('dump_hlo')
    from superdiff_tpu.models.sd.unet import SDUNet, SDUNetConfig

    key = jax.random.PRNGKey(0)
    unet = SDUNet(SDUNetConfig())
    lat = jax.random.normal(key, (B, 64, 64, 4), jnp.bfloat16)
    ctx = jax.random.normal(key, (B, 77, 768), jnp.bfloat16)
    params = jax.jit(unet.init)(key, lat[:1, :8, :8], jnp.zeros(()), ctx[:1])["params"]
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def scanned(p, c, l):
        def body(x, _):
            return unet.apply({"params": p}, x, jnp.float32(500.0), c).astype(
                jnp.bfloat16
            ), ()

        out, _ = jax.lax.scan(body, l, None, length=K)
        return out

    txt = jax.jit(scanned).lower(params, ctx, lat).compile().as_text()
    with open("/tmp/unet_hlo.txt", "w") as f:
        f.write(txt)
    print(f"wrote /tmp/unet_hlo.txt ({len(txt)} bytes)", file=sys.stderr)

    targets = sys.argv[1:]
    if not targets:
        return
    # print the computation body for each named fusion
    for t in targets:
        pat = re.compile(rf"(?m)^\s*%?{re.escape(t)} = .*$")
        m = pat.search(txt)
        print(f"\n===== {t} =====")
        if not m:
            print("  (not found)")
            continue
        line = m.group(0)
        print(line[:400])
        cm = re.search(r"calls=([%\w.\-]+)", line)
        if cm:
            comp = cm.group(1).lstrip("%")
            cpat = re.compile(
                rf"(?ms)^%?{re.escape(comp)} .*?^\}}", re.M
            )
            cmatch = cpat.search(txt)
            if cmatch:
                body = cmatch.group(0)
                print(body[:3000])


if __name__ == "__main__":
    main()
