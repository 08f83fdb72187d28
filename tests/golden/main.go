// Go-golden generator: runs the REFERENCE implementation
// (github.com/shamspias/fennec) over the deterministic PNG inputs
// written by gen_inputs.py and records SSIM / SSIMFast / MS-SSIM /
// Analyze values to golden_go.json.
//
// Usage (needs a Go >= 1.25 toolchain and the reference checkout):
//
//	cd tests/golden
//	python gen_inputs.py            # from the repo venv
//	go mod init golden
//	go mod edit -replace github.com/shamspias/fennec=/root/reference
//	go mod tidy
//	go run . > ../golden_go.json
//
// tests/test_golden_go.py picks the file up automatically.
package main

import (
	"encoding/json"
	"fmt"
	"image"
	"image/png"
	"os"
	"path/filepath"
	"sort"
	"strings"

	fennec "github.com/shamspias/fennec"
)

type entry struct {
	SSIM     map[string]float64 `json:"ssim"`
	SSIMFast map[string]float64 `json:"ssim_fast"`
	MSSSIM   map[string]float64 `json:"ms_ssim"`
	Analyze  map[string]any     `json:"analyze"`
}

func load(path string) *image.NRGBA {
	f, err := os.Open(path)
	if err != nil {
		panic(err)
	}
	defer f.Close()
	img, err := png.Decode(f)
	if err != nil {
		panic(err)
	}
	b := img.Bounds()
	out := image.NewNRGBA(b)
	for y := b.Min.Y; y < b.Max.Y; y++ {
		for x := b.Min.X; x < b.Max.X; x++ {
			out.Set(x, y, img.At(x, y))
		}
	}
	return out
}

func main() {
	paths, _ := filepath.Glob("inputs/*.png")
	sort.Strings(paths)
	imgs := map[string]*image.NRGBA{}
	for _, p := range paths {
		name := strings.TrimSuffix(filepath.Base(p), ".png")
		imgs[name] = load(p)
	}
	out := entry{
		SSIM:     map[string]float64{},
		SSIMFast: map[string]float64{},
		MSSSIM:   map[string]float64{},
		Analyze:  map[string]any{},
	}
	for name, img := range imgs {
		// self-SSIM and degraded pairs
		out.SSIM[name+"|self"] = fennec.SSIM(img, img)
		st := fennec.Analyze(img)
		out.Analyze[name] = map[string]any{
			"width": st.Width, "height": st.Height,
			"has_alpha": st.HasAlpha, "is_grayscale": st.IsGrayscale,
			"unique_colors": st.UniqueColors, "entropy": st.Entropy,
			"edge_density": st.EdgeDensity,
			"mean_brightness": st.MeanBrightness,
			"contrast": st.Contrast,
		}
	}
	for name, img := range imgs {
		for _, suffix := range []string{"_q50", "_q85"} {
			if deg, ok := imgs[name+suffix]; ok {
				key := name + "|" + name + suffix
				out.SSIM[key] = fennec.SSIM(img, deg)
				out.SSIMFast[key] = fennec.SSIMFast(img, deg)
				out.MSSSIM[key] = fennec.MSSSIM(img, deg)
			}
		}
	}
	enc := json.NewEncoder(os.Stdout)
	enc.SetIndent("", " ")
	if err := enc.Encode(out); err != nil {
		fmt.Fprintln(os.Stderr, err)
		os.Exit(1)
	}
}
