"""Network/identity transformers: RandomIp, RandomMac, RandomEmail.

Reference semantics:
- RandomIp (internal/db/postgres/transformers/random_ip.go:27-165, core
  generators/transformers/random_ip.go): random host address inside a
  ``subnet`` parameter (dynamic-capable).
- RandomMac (random_mac.go:41-231): random MAC; options keep the original
  vendor (OUI) bits and manage multicast/local bits.
- RandomEmail (email.go:20-343): random local/domain parts with
  ``keep_original_domain`` and template-able parts; default random local
  part is hex.

Implemented as integer arithmetic + formatting Column expressions (no
Python ipaddress on the hot path; subnet is parsed at plan time).
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column
from pyspark.sql import functions as F

from greenmask_spark.transformers.base import (
    BuildContext,
    Transformer,
    keep_null_guard,
    register,
)


def _ipv4_from_int(n: Column) -> Column:
    return F.concat_ws(
        ".",
        F.shiftright(n, 24).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(n, 16).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(n, 8).bitwiseAND(F.lit(255)).cast("string"),
        n.bitwiseAND(F.lit(255)).cast("string"),
    )


@register
class RandomIp(Transformer):
    name = "RandomIp"
    allowed_types = ("inet", "text", "varchar")
    defaults = {"subnet": "0.0.0.0/0", "keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        subnet = ctx.params.get("subnet", "0.0.0.0/0")
        net = ipaddress.ip_network(subnet, strict=False)
        if net.version != 4:
            raise ValueError("RandomIp: only IPv4 subnets supported")
        base = int(net.network_address)
        # exclude network+broadcast when the subnet has >2 hosts
        n_hosts = net.num_addresses
        off_lo, off_hi = (1, n_hosts - 2) if n_hosts > 2 else (0, n_hosts - 1)
        off = ctx.engine.uniform_int(ctx.col(), F.lit(off_lo), F.lit(off_hi))
        out = _ipv4_from_int(F.lit(base) + off)
        return keep_null_guard(ctx.col(), out, ctx.params.get("keep_null", True))


@register
class RandomMac(Transformer):
    name = "RandomMac"
    allowed_types = ("macaddr", "text", "varchar")
    defaults = {"keep_original_vendor": False, "cast_type": "any", "keep_null": True}

    def build(self, ctx: BuildContext) -> Column:
        p = ctx.params
        h = ctx.engine.hex(ctx.col())
        octets = [F.substring(h, 1 + 2 * i, 2) for i in range(6)]
        if p.get("keep_original_vendor"):
            # keep first 3 original octets (OUI), randomize the NIC part
            orig = F.lower(F.regexp_replace(ctx.col().cast("string"), "[:-]", ""))
            octets = [F.substring(orig, 1 + 2 * i, 2) for i in range(3)] + octets[3:]
        else:
            # clear multicast bit, set locally-administered bit on octet 0:
            # (o0 & 0xFC) | 0x02 done in int space then re-hexed
            o0 = F.conv(octets[0], 16, 10).cast("int")
            o0 = o0.bitwiseAND(F.lit(0xFC)).bitwiseOR(F.lit(0x02))
            octets[0] = F.lpad(F.lower(F.conv(o0.cast("string"), 10, 16)), 2, "0")
        out = F.concat_ws(":", *octets)
        return keep_null_guard(ctx.col(), out, p.get("keep_null", True))


@register
class RandomEmail(Transformer):
    name = "RandomEmail"
    allowed_types = ("text", "varchar", "citext")
    defaults = {"keep_original_domain": False, "local_part_length": 16,
                "keep_null": True}

    DOMAINS = ("example.com", "example.org", "example.net", "mail.test", "inbox.test")

    def build(self, ctx: BuildContext) -> Column:
        p = ctx.params
        h = ctx.engine.hex(ctx.col())
        local = F.substring(h, 1, int(p.get("local_part_length", 16)))
        if p.get("keep_original_domain"):
            domain = F.regexp_extract(ctx.col(), "@(.+)$", 1)
        elif p.get("domains"):
            doms = list(p["domains"])
            idx = ctx.engine.uniform_int(ctx.col(), F.lit(0), F.lit(len(doms) - 1), draw=1)
            domain = F.element_at(F.array(*[F.lit(d) for d in doms]), idx.cast("int") + 1)
        else:
            doms = list(self.DOMAINS)
            idx = ctx.engine.uniform_int(ctx.col(), F.lit(0), F.lit(len(doms) - 1), draw=1)
            domain = F.element_at(F.array(*[F.lit(d) for d in doms]), idx.cast("int") + 1)
        out = F.concat(local, F.lit("@"), domain)
        return keep_null_guard(ctx.col(), out, p.get("keep_null", True))
