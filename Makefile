# spark-kg — entry points (analog of the reference's Makefile targets)

PY ?= python
SF ?= /root/testdata/sf0.1

.PHONY: test bench scaling demo clean

test:
	$(PY) -m pytest tests/ -x -q

bench:
	SPARK_GRAFT_SF_DIR=$(SF) $(PY) bench.py

scaling:
	$(PY) bench_scaling.py

# full spark-submit --py-files demo: synth corpus -> triples, from a zip
demo:
	rm -rf /tmp/kg_demo && mkdir -p /tmp/kg_demo
	zip -qr /tmp/kg_demo/kg.zip rdf_i2b2_converter_spark
	cp submit.py /tmp/kg_demo/
	cd /tmp/kg_demo && spark-submit --master local[8] --py-files kg.zip submit.py \
		synth --n-docs 10000 --partitions 32 --out corpus
	cd /tmp/kg_demo && spark-submit --master local[8] --py-files kg.zip submit.py \
		pipeline --pages corpus/pages --gazetteer corpus/gazetteer \
		--ontology corpus/ontology --alias-edges corpus/alias_edges \
		--out triples --parts 32

clean:
	rm -rf /tmp/kg_demo /tmp/kgsub
