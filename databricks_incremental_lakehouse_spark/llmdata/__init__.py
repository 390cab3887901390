"""LLM-training-data operators (extension beyond the reference surface).

Modules: text analysis (textstats), deduplication (dedup), corpus curation
(curation: dup clustering, decontamination, sampling, sequence packing),
similarity search (similarity), multimodal column plumbing (multimodal),
sketch aggregates (sketches: HyperLogLog distinct, count-min heavy
hitters, Bloom membership, KMV overlap), graph analytics over the
near-dup graph (graph: fixed-point PageRank), and training-shard
assignment / token-budget selection (sharding). Each operator is
registered as an oracle-checked query where SQL-expressible.
"""

from . import (
    boilerplate,
    bpe,
    corpusstats,
    curation,
    dedup,
    docquality,
    graph,
    incrdedup,
    incrsketch,
    incrstats,
    maintenance,
    multimodal,
    pii,
    pq,
    sharding,
    similarity,
    sketches,
    textstats,
)


def register_all(register) -> None:
    textstats.register_all(register)
    pii.register_all(register)
    boilerplate.register_all(register)
    bpe.register_all(register)
    docquality.register_all(register)
    corpusstats.register_all(register)
    dedup.register_all(register)
    curation.register_all(register)
    similarity.register_all(register)
    multimodal.register_all(register)
    sketches.register_all(register)
    graph.register_all(register)
    sharding.register_all(register)
    incrstats.register_all(register)
    incrdedup.register_all(register)
    incrsketch.register_all(register)
    pq.register_all(register)
    maintenance.register_all(register)
