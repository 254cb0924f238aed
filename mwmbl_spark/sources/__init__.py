from mwmbl_spark.sources.transcripts import (  # noqa: F401
    load_transcripts,
    transcripts_from_documents,
)
