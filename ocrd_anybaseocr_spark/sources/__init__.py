from .tables import load_corpus, load_table, spark_session
