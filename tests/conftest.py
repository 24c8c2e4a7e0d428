import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    yield
    ray.shutdown()


_REF_CRAWLER = "/root/reference/Serial Version/src/crawler.c"


@pytest.fixture(scope="session")
def ref_html_to_text_bin(tmp_path_factory):
    """Compile the reference's ACTUAL html_to_text state machine (plus its
    helpers starts_with / is_useful_content, `Serial Version/src/crawler.c:
    104-437`) into a stdin->stdout filter for differential byte-equality
    tests. The reference source is read in place (read-only); nothing is
    copied into the repo."""
    d = tmp_path_factory.mktemp("refbin")
    src = d / "ref_html_to_text.c"
    body = subprocess.run(
        ["sed", "-n", "104,437p", _REF_CRAWLER], capture_output=True, text=True, check=True
    ).stdout
    src.write_text(
        "#include <stdio.h>\n#include <stdlib.h>\n#include <string.h>\n"
        "#include <ctype.h>\n#include <strings.h>\n"
        + body
        + """
int main(void) {
    size_t cap = 1 << 20, n = 0;
    char *buf = malloc(cap);
    size_t got;
    while ((got = fread(buf + n, 1, cap - n - 1, stdin)) > 0) {
        n += got;
        if (n + 1 >= cap) { cap *= 2; buf = realloc(buf, cap); }
    }
    buf[n] = 0;
    html_to_text(buf, stdout);
    return 0;
}
"""
    )
    exe = d / "ref_html_to_text"
    subprocess.run(["gcc", "-O1", "-o", str(exe), str(src)], check=True)
    return str(exe)


@pytest.fixture(scope="session")
def ref_normalize_url_bin(tmp_path_factory):
    """Compile the reference's normalize_url (`Serial Version/src/crawler.c:
    514-558`): reads URLs one per line, prints normalized forms."""
    d = tmp_path_factory.mktemp("refbin2")
    src = d / "ref_norm.c"
    body = subprocess.run(
        ["sed", "-n", "514,558p", _REF_CRAWLER], capture_output=True, text=True, check=True
    ).stdout
    src.write_text(
        "#include <stdio.h>\n#include <stdlib.h>\n#include <string.h>\n"
        "#define MAX_URL_LENGTH 512\n#define __thread\n"
        "static char* normalize_url(const char* url);\n"
        + body
        + """
int main(void) {
    char line[4096];
    while (fgets(line, sizeof(line), stdin)) {
        line[strcspn(line, "\\n")] = 0;
        printf("%s\\n", normalize_url(line));
    }
    return 0;
}
"""
    )
    exe = d / "ref_norm"
    subprocess.run(["gcc", "-O1", "-o", str(exe), str(src)], check=True)
    return str(exe)
