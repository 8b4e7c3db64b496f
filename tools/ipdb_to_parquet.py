#!/usr/bin/env python3
"""Convert an ipip.net `.ipdb` binary geo database into the `ip_region`
parquet dim consumed by `graft.operators.IpGeo.withGeo` (q48's range
table: range_start, range_end, province_name, city_name, district_name,
operator, code).

The reference resolves IPs one at a time through the `net.ipip.ipdb`
reader (`nqs-common/.../util/IPIPUtil.java:10-70`); graft replaces that
per-row lookup with a broadcast range join, so the binary trie must be
flattened to ranges ONCE at ingest time — this tool is that seam. The
reference repo ships no `.ipdb` blobs (.MISSING_LARGE_BLOBS), so parity
is asserted against a synthetic fixture instead (`--selftest`).

Format (public, per the open-source ipdb readers — ipipdotnet/ipdb-python
and ipdb-java):
  [0:4)   big-endian uint32: metadata length M
  [4:4+M) JSON metadata: {build, ip_version, languages: {name: field
          offset}, node_count, total_size, fields: [...]}
  then    node area: node_count records of 2 big-endian int32 (bit-0 /
          bit-1 child), followed by the payload blob.
  A child value v < node_count is an internal node; v >= node_count is a
  leaf whose payload lives at blob
  offset v - node_count (2-byte big-endian length + UTF-8, fields joined
  by tabs, one run of len(fields) per language at its offset).
  IPv4 databases root the 32-bit trie under the ::ffff:0:0/96 path
  (80 zero-bits then 16 one-bits), exactly like the readers' v4offset.

Usage:
  python3 tools/ipdb_to_parquet.py <in.ipdb> <out.parquet> [--lang CN]
  python3 tools/ipdb_to_parquet.py --selftest
"""
import json
import struct
import sys


# ---------------------------------------------------------------- reader

class Ipdb:
    def __init__(self, blob: bytes):
        (meta_len,) = struct.unpack_from(">I", blob, 0)
        self.meta = json.loads(blob[4:4 + meta_len].decode("utf-8"))
        self.data = blob[4 + meta_len:]
        self.node_count = self.meta["node_count"]
        self.fields = self.meta["fields"]
        self.languages = self.meta.get("languages", {"CN": 0})
        if len(self.data) != self.meta["total_size"]:
            raise ValueError(
                f"total_size {self.meta['total_size']} != data "
                f"{len(self.data)} — truncated file?")

    def read_node(self, node: int, idx: int) -> int:
        off = node * 8 + idx * 4
        return struct.unpack_from(">I", self.data, off)[0]

    def v4_root(self) -> int:
        """Walk the ::ffff:0:0/96 chain (80 zeros, 16 ones) to the root
        of the 32-bit IPv4 trie — the readers' v4offset."""
        node = 0
        for i in range(96):
            if node >= self.node_count:
                break
            node = self.read_node(node, 1 if i >= 80 else 0)
        return node

    def resolve(self, node: int, lang: str):
        off = node - self.node_count + self.node_count * 8
        size = (self.data[off] << 8) | self.data[off + 1]
        body = self.data[off + 2:off + 2 + size].decode("utf-8")
        vals = body.split("\t")
        base = self.languages.get(lang, 0)
        return vals[base:base + len(self.fields)]

    def iter_ranges(self, lang: str):
        """DFS the IPv4 trie into (start, end, fields) leaf ranges."""
        out = []
        root = self.v4_root()
        stack = [(root, 0, 0)]  # node, depth, prefix
        while stack:
            node, depth, prefix = stack.pop()
            if node >= self.node_count:
                # standard ipdb readers treat node >= node_count as a
                # record pointer (node == node_count is payload offset 0),
                # so resolve it — a real file storing a record at offset 0
                # must not be silently dropped. The synthetic builder
                # reserves offset 0 as an EMPTY payload for its unset
                # branches; an all-empty record is that padding, skipped.
                vals = self.resolve(node, lang)
                if not any(vals):
                    continue  # builder's no-record padding
                lo = prefix << (32 - depth)
                hi = lo | ((1 << (32 - depth)) - 1)
                out.append((lo, hi, vals))
                continue
            if depth == 32:
                raise ValueError("internal node at depth 32 — corrupt trie")
            stack.append((self.read_node(node, 1), depth + 1,
                          (prefix << 1) | 1))
            stack.append((self.read_node(node, 0), depth + 1, prefix << 1))
        out.sort(key=lambda r: r[0])
        return out


def field_index(fields, *names):
    for n in names:
        if n in fields:
            return fields.index(n)
    return -1


def to_dim_rows(db: Ipdb, lang: str):
    """Map ipdb fields onto the q48 dim schema and coalesce adjacent
    ranges with identical attributes (the trie splits CIDR-aligned)."""
    f = db.fields
    i_prov = field_index(f, "region_name")
    i_city = field_index(f, "city_name")
    i_dist = field_index(f, "district_name")
    i_op = field_index(f, "isp_domain", "owner_domain")
    i_code = field_index(f, "china_admin_code")

    def pick(vals, i):
        return vals[i] if 0 <= i < len(vals) else ""

    rows = []
    for lo, hi, vals in db.iter_ranges(lang):
        rec = (pick(vals, i_prov), pick(vals, i_city), pick(vals, i_dist),
               pick(vals, i_op), pick(vals, i_code))
        if rows and rows[-1][1] + 1 == lo and rows[-1][2:] == rec:
            rows[-1] = (rows[-1][0], hi) + rec  # merge equal neighbors
        else:
            rows.append((lo, hi) + rec)
    return rows


COLUMNS = ["range_start", "range_end", "province_name", "city_name",
           "district_name", "operator", "code"]


def write_parquet(rows, out_path: str):
    import pyarrow as pa
    import pyarrow.parquet as pq
    cols = list(zip(*rows)) if rows else [[] for _ in COLUMNS]
    table = pa.table({
        "range_start": pa.array(cols[0], pa.int64()),
        "range_end": pa.array(cols[1], pa.int64()),
        "province_name": pa.array(cols[2], pa.string()),
        "city_name": pa.array(cols[3], pa.string()),
        "district_name": pa.array(cols[4], pa.string()),
        "operator": pa.array(cols[5], pa.string()),
        "code": pa.array(cols[6], pa.string()),
    })
    pq.write_table(table, out_path)


# ------------------------------------------------- synthetic ipdb builder

def build_ipdb(cidrs, fields, lang="CN"):
    """Build a minimal, reader-faithful v4 `.ipdb` from
    [(cidr, [field values])] — used by --selftest and reusable for
    fixture generation. Blob offset 0 is a reserved EMPTY payload: unset
    branches encode as node_count (offset 0), which readers resolve to an
    all-empty record and this tool's iter_ranges skips as no-record."""
    nodes = [[-1, -1]]  # -1 = unset (points at the reserved empty payload)
    # the ::ffff:0:0/96 chain the readers walk for v4
    cur = 0
    for i in range(96):
        nxt = len(nodes)
        nodes.append([-1, -1])
        nodes[cur][1 if i >= 80 else 0] = nxt
        cur = nxt
    v4root = cur

    blob = bytearray(b"\x00\x00\x00\x00")
    payload_at = {}

    def payload(vals):
        key = tuple(vals)
        if key not in payload_at:
            body = "\t".join(vals).encode("utf-8")
            payload_at[key] = len(blob)
            blob.extend(struct.pack(">H", len(body)))
            blob.extend(body)
        return payload_at[key]

    leaves = []  # (node, bit, payload offset) patched after node_count known
    for cidr, vals in cidrs:
        ip, plen = cidr.split("/")
        plen = int(plen)
        a, b, c, d = (int(x) for x in ip.split("."))
        addr = (a << 24) | (b << 16) | (c << 8) | d
        node = v4root
        for depth in range(plen):
            bit = (addr >> (31 - depth)) & 1
            if depth == plen - 1:
                leaves.append((node, bit, payload(vals)))
            else:
                if nodes[node][bit] == -1:
                    nodes[node][bit] = len(nodes)
                    nodes.append([-1, -1])
                elif nodes[node][bit] >= len(nodes):
                    raise ValueError(f"{cidr} nested under an existing leaf")
                node = nodes[node][bit]

    n = len(nodes)
    for node, bit, off in leaves:
        if nodes[node][bit] != -1:
            raise ValueError("overlapping CIDRs in fixture")
        nodes[node][bit] = n + off
    node_area = bytearray()
    for l, r in nodes:
        node_area.extend(struct.pack(">II", n if l == -1 else l,
                                     n if r == -1 else r))
    data = bytes(node_area) + bytes(blob)
    meta = json.dumps({
        "build": 0, "ip_version": 1, "languages": {lang: 0},
        "node_count": n, "total_size": len(data), "fields": fields,
    }).encode("utf-8")
    return struct.pack(">I", len(meta)) + meta + data


def selftest():
    fields = ["country_name", "region_name", "city_name", "district_name",
              "isp_domain", "china_admin_code"]
    cidrs = [
        ("1.0.0.0/24", ["中国", "北京", "北京", "", "电信", "110000"]),
        ("1.0.1.0/24", ["中国", "北京", "北京", "", "电信", "110000"]),
        ("9.8.0.0/16", ["中国", "广东", "深圳", "南山区", "联通", "440305"]),
        ("222.16.0.0/12", ["中国", "四川", "成都", "", "移动", "510100"]),
    ]
    db = Ipdb(build_ipdb(cidrs, fields))
    rows = to_dim_rows(db, "CN")
    assert [r[:2] for r in rows] == [
        (0x01000000, 0x010001FF),           # the two /24s merged
        (0x09080000, 0x0908FFFF),
        (0xDE100000, 0xDE1FFFFF),
    ], rows
    assert rows[0][2:] == ("北京", "北京", "", "电信", "110000"), rows[0]
    assert rows[1][2:] == ("广东", "深圳", "南山区", "联通", "440305")
    assert rows[2][2:] == ("四川", "成都", "", "移动", "510100")
    # q48 dim schema, exactly
    assert COLUMNS == ["range_start", "range_end", "province_name",
                       "city_name", "district_name", "operator", "code"]
    # point lookups through the same walk the java reader does
    def find(ip_str):
        a, b, c, d = (int(x) for x in ip_str.split("."))
        addr = (a << 24) | (b << 16) | (c << 8) | d
        node = db.v4_root()
        for depth in range(32):
            if node >= db.node_count:
                break
            node = db.read_node(node, (addr >> (31 - depth)) & 1)
        return db.resolve(node, "CN") if node > db.node_count else None
    assert find("1.0.1.7")[1] == "北京"
    assert find("9.8.250.1")[3] == "南山区"
    assert find("8.8.8.8") is None
    print("selftest OK:", len(rows), "merged ranges")


def main(argv):
    if "--selftest" in argv:
        selftest()
        return 0
    if len(argv) < 3:
        print(__doc__)
        return 2
    lang = argv[argv.index("--lang") + 1] if "--lang" in argv else "CN"
    with open(argv[1], "rb") as fh:
        db = Ipdb(fh.read())
    rows = to_dim_rows(db, lang)
    write_parquet(rows, argv[2])
    print(f"{argv[2]}: {len(rows)} ranges ({len(db.fields)} fields, "
          f"lang={lang})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
