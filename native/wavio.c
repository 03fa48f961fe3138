/* Native WAV decoder C extension — the framework's libsndfile-equivalent for
 * the host input pipeline (the reference decodes audio via soundfile ->
 * libsndfile, a native C library; SURVEY.md §2.3 N11/R5). Parses RIFF/WAVE
 * containers (PCM 8/16/24/32-bit and IEEE float32/64), converts to mono
 * float32 in [-1, 1] with channel-mean mixdown, releasing the GIL while
 * crunching bytes so dataloader threads overlap with device compute.
 *
 * Exposes: decode(bytes) -> (bytes float32_pcm, sample_rate:int, n:int)
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

static uint32_t rd_u32(const uint8_t *p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
           ((uint32_t)p[3] << 24);
}
static uint16_t rd_u16(const uint8_t *p) {
    return (uint16_t)((uint16_t)p[0] | ((uint16_t)p[1] << 8));
}

static PyObject *wav_decode(PyObject *self, PyObject *args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
    const uint8_t *data = (const uint8_t *)buf.buf;
    Py_ssize_t len = buf.len;

    if (len < 12 || memcmp(data, "RIFF", 4) != 0 ||
        memcmp(data + 8, "WAVE", 4) != 0) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "not a RIFF/WAVE file");
        return NULL;
    }

    uint16_t audio_format = 0, n_channels = 0, bits = 0;
    uint32_t sample_rate = 0;
    const uint8_t *payload = NULL;
    uint32_t payload_len = 0;

    Py_ssize_t pos = 12;
    while (pos + 8 <= len) {
        const uint8_t *cid = data + pos;
        uint32_t csize = rd_u32(data + pos + 4);
        if (pos + 8 + (Py_ssize_t)csize > len)
            csize = (uint32_t)(len - pos - 8);
        if (memcmp(cid, "fmt ", 4) == 0 && csize >= 16) {
            const uint8_t *f = data + pos + 8;
            audio_format = rd_u16(f);
            n_channels = rd_u16(f + 2);
            sample_rate = rd_u32(f + 4);
            bits = rd_u16(f + 14);
            if (audio_format == 0xFFFE && csize >= 24 + 2)
                audio_format = rd_u16(f + 24);  /* extensible: subformat tag */
        } else if (memcmp(cid, "data", 4) == 0) {
            payload = data + pos + 8;
            payload_len = csize;
        }
        pos += 8 + csize + (csize & 1);
    }

    if (!payload || !n_channels || !sample_rate ||
        !(audio_format == 1 || audio_format == 3)) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "unsupported or malformed wav");
        return NULL;
    }

    uint32_t bytes_per = bits / 8;
    if (bytes_per == 0 || (audio_format == 1 && bits != 8 && bits != 16 &&
                           bits != 24 && bits != 32) ||
        (audio_format == 3 && bits != 32 && bits != 64)) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "unsupported wav bit depth");
        return NULL;
    }

    uint32_t n_frames = payload_len / (bytes_per * n_channels);
    PyObject *out = PyBytes_FromStringAndSize(NULL,
                                              (Py_ssize_t)n_frames * 4);
    if (!out) { PyBuffer_Release(&buf); return NULL; }
    float *dst = (float *)PyBytes_AS_STRING(out);

    Py_BEGIN_ALLOW_THREADS
    for (uint32_t i = 0; i < n_frames; i++) {
        double acc = 0.0;
        for (uint16_t c = 0; c < n_channels; c++) {
            const uint8_t *s = payload + ((size_t)i * n_channels + c) * bytes_per;
            double v = 0.0;
            if (audio_format == 1) {
                if (bits == 8) {
                    v = ((double)s[0] - 128.0) / 128.0;
                } else if (bits == 16) {
                    int16_t x = (int16_t)rd_u16(s);
                    v = (double)x / 32768.0;
                } else if (bits == 24) {
                    int32_t x = (int32_t)((uint32_t)s[0] | ((uint32_t)s[1] << 8) |
                                          ((uint32_t)s[2] << 16));
                    if (x & 0x800000) x -= 0x1000000;
                    v = (double)x / 8388608.0;
                } else { /* 32 */
                    int32_t x = (int32_t)rd_u32(s);
                    v = (double)x / 2147483648.0;
                }
            } else { /* IEEE float */
                if (bits == 32) {
                    float fv; memcpy(&fv, s, 4); v = (double)fv;
                } else {
                    double dv; memcpy(&dv, s, 8); v = dv;
                }
            }
            acc += v;
        }
        dst[i] = (float)(acc / (double)n_channels);
    }
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&buf);
    return Py_BuildValue("(NIi)", out, sample_rate, (int)n_frames);
}

static PyMethodDef wavio_methods[] = {
    {"decode", wav_decode, METH_VARARGS,
     "decode(bytes) -> (float32 pcm bytes, sample_rate, n_frames)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef wavio_module = {
    PyModuleDef_HEAD_INIT, "_wavio", "native WAV decoder", -1, wavio_methods,
};

PyMODINIT_FUNC PyInit__wavio(void) { return PyModule_Create(&wavio_module); }
