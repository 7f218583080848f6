from .transcripts import (  # noqa: F401
    generate_transcripts,
    generate_asof_snapshots,
    materialize,
    read_transcripts,
    sf_to_n_turns,
)
