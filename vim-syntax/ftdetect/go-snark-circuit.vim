au BufRead,BufNewFile *.circuit set filetype=go-snark-circuit
