"""J2 large-alias-dictionary linking path (co-partitioned, no broadcast)."""

import pandas as pd
import pyarrow as pa

from cattle_ray.aliases import alias_table
from cattle_ray.stages.link import build_alias_index, link_large_dict


def test_link_large_dict_matches_broadcast(ray_session):
    import ray.data as rd

    mentions = pd.DataFrame(
        {
            "url": ["u1", "u2", "u3", "u4"],
            "mention": ["Qatar", "norway", "Entity08", "NoSuchEntity"],
            "alias_norm": ["qatar", "norway", "entity08", "nosuchentity"],
        }
    )
    m_ds = rd.from_pandas(mentions)
    a_ds = rd.from_arrow(alias_table())
    out = link_large_dict(m_ds, a_ds, num_buckets=8).to_pandas()

    # same candidate multiset as the broadcast index
    idx = build_alias_index(alias_table())
    want = []
    for _, row in mentions.iterrows():
        for uri, prior in idx.get(row["alias_norm"], []):
            want.append((row["url"], uri, prior))
    got = sorted(zip(out["url"], out["entity_uri"], out["prior"]))
    assert got == sorted(want)
    # unmatched mention drops out (inner join); the engineered-ambiguous
    # alias yields candidates for BOTH entity readings
    assert "u4" not in set(out["url"])
    u3_uris = set(out[out["url"] == "u3"]["entity_uri"])
    assert len(u3_uris) == 2
