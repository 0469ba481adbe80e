from .transcripts import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
    transcripts_parquet_dir,
)
