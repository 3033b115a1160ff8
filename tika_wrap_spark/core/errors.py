class ExtractError(Exception):
    """Per-document extraction failure.

    Mirrors the reference's error policy: a failed parse is *data*, not an
    exception that escapes the engine — the reference returns a single bool
    per document (/root/reference/src/java-env.h:17, src/java-env.cpp:316-325)
    and swallows JNI exceptions after logging (src/java-env.cpp:351-353).
    The Spark pipeline catches this per document and emits
    ``parse_ok=false, error=<msg>, spans=[]``; it must never fail a task.
    """
