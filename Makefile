# Convenience entry points; everything here shells into scripts/ with
# the same environment the driver uses.

STRESS_OPS ?= dedup_exact,dedup_minhash_lsh,dedup_simhash,dedup_pipeline,dedup_cross_corpus,dedup_cross_corpus_minhash,dedup_cross_corpus_indexed,corpus_train_shards

.PHONY: test bench sweep stress stress-100 stress-r8 stress-r9 stress-r10

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

# full-registry oracle sweep at sf0.01 (the driver-replica shape)
sweep:
	python tests/driver_replica.py /root/testdata/sf0.01

# 30× sf0.1 stress: the dedup/simhash/index family at 1.5M docs, with
# band-bucket guard activations recorded per op (SCALING.md table)
stress:
	SMOKE_OPS=$(STRESS_OPS) python scripts/scale_smoke.py 30

# 100× decade (5M docs) for the linear-scan subset — the quadratic-in-
# output ops stay at 30× where their true pair lists remain bounded
stress-100:
	SMOKE_OPS=dedup_exact,dedup_minhash_lsh,dedup_pipeline,dedup_cross_corpus_indexed,corpus_train_shards python scripts/scale_smoke.py 100

# round-8 additions: PIT hot-key versions decade + stream-stream
# interval-join state vs window width (SCALING.md round-8 table)
stress-r8:
	python scripts/stress_r8.py

# round-9 additions: bucketed SCD2 upsert decade, 100-increment
# maintenance + closed compaction, incremental BPE trainer curve
# (SCALING.md round-9 table)
stress-r9:
	python scripts/stress_r9.py

# round-10 additions: SCD2 purge/migration/expiry decade + band-index
# and IVF-index erasure walls (SCALING.md round-10 tables)
stress-r10:
	python scripts/stress_r10.py
